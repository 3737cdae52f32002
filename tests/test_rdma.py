"""Persistent RDMA multi-chip PCG kernel (tpcg/parallel/rdma_knot.py)
under the distributed TPU interpreter: oracle parity on 2/4/8 virtual
devices, iteration-count parity, warm starts, and a happens-before race
detection pass over a full solve (the in-kernel semaphore schedule is the
correctness surface here — SURVEY.md §5.2's sanitizer story with teeth)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh

from tpcg import layout, precond
from tpcg.parallel.rdma_knot import pcg_rdma_sharded
from tpcg.solver import jnp_backend

INTERP = pltpu.InterpretParams()


def _mesh(d):
    devs = jax.devices()
    if len(devs) < d:
        pytest.skip(f"needs {d} devices, have {len(devs)}")
    return Mesh(np.array(devs[:d]), ("knot",))


def _system(n, K, seed=0):
    S = layout.random_spd_cbtd(jax.random.PRNGKey(seed), n, K,
                               dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(seed + 1), (K, n), jnp.float32)
    return S, g


@pytest.mark.parametrize("d", [2, 4, 8])
def test_rdma_matches_oracle(d):
    n, K = 5, 32
    S, g = _system(n, K, seed=d)
    Pb = precond.build(S, "symmetric_stair").blocks
    lam0 = jnp.zeros_like(g)
    res = pcg_rdma_sharded(S.blocks, Pb, g, lam0, mesh=_mesh(d),
                           exit_tol=1e-8, max_iter=200,
                           interpret_params=INTERP)
    ref = jnp_backend.pcg_jnp(S.blocks, Pb, g, lam0, exit_tol=1e-8,
                              max_iter=200)
    assert bool(res.converged) and bool(ref.converged)
    # fixed-order mailbox reduce vs jnp.sum: fp32 association differs ->
    # the usual +-1-pass slack (SURVEY.md §7 hard parts)
    assert abs(int(res.iters) - int(ref.iters)) <= 1
    np.testing.assert_allclose(np.asarray(res.lam), np.asarray(ref.lam),
                               rtol=2e-4, atol=2e-5)


def test_rdma_warm_start_and_zero_iters():
    n, K, d = 4, 16, 4
    S, g = _system(n, K, seed=11)
    Pb = precond.build(S, "block_jacobi").blocks
    res = pcg_rdma_sharded(S.blocks, Pb, g, jnp.zeros_like(g),
                           mesh=_mesh(d), exit_tol=1e-8, max_iter=200,
                           interpret_params=INTERP)
    assert bool(res.converged)
    # resolving from the solution: 0 iterations (the quirk-policy fast path)
    res2 = pcg_rdma_sharded(S.blocks, Pb, g, res.lam, mesh=_mesh(d),
                            exit_tol=1e-6, max_iter=200,
                            interpret_params=INTERP)
    assert int(res2.iters) == 0
    assert bool(res2.converged)


def test_rdma_race_detector_clean():
    """Run the happens-before race detector over a full multi-device
    solve: the A/B alternating halo buffers and mailboxes plus the
    start/teardown barriers must leave ZERO races."""
    from jax._src.pallas.mosaic.interpret import interpret_pallas_call as ipc

    n, K, d = 4, 16, 4
    S, g = _system(n, K, seed=21)
    Pb = precond.build(S, "symmetric_stair").blocks
    params = pltpu.InterpretParams(detect_races=True)
    res = pcg_rdma_sharded(S.blocks, Pb, g, jnp.zeros_like(g),
                           mesh=_mesh(d), exit_tol=1e-7, max_iter=100,
                           interpret_params=params)
    jax.block_until_ready(res.lam)
    assert bool(res.converged)
    # the interpreter's module-global happens-before state for this run
    assert ipc.races is not None and not ipc.races.races_found


@pytest.mark.parametrize("d", [2, 4])
def test_rdma_pipelined_matches_oracle(d):
    """Pipelined method (one combined mailbox round per iteration) vs the
    pipelined jnp oracle — its own iteration semantics, so parity is
    against pcg_pipelined_jnp, not the classic loop."""
    from tpcg.solver.pipelined import pcg_pipelined_jnp

    n, K = 5, 32
    S, g = _system(n, K, seed=30 + d)
    Pb = precond.build(S, "symmetric_stair").blocks
    lam0 = jnp.zeros_like(g)
    res = pcg_rdma_sharded(S.blocks, Pb, g, lam0, mesh=_mesh(d),
                           exit_tol=1e-8, max_iter=200,
                           method="pipelined", interpret_params=INTERP)
    ref = pcg_pipelined_jnp(S.blocks, Pb, g, lam0, exit_tol=1e-8,
                            max_iter=200)
    assert bool(res.converged) and bool(ref.converged)
    assert abs(int(res.iters) - int(ref.iters)) <= 1
    np.testing.assert_allclose(np.asarray(res.lam), np.asarray(ref.lam),
                               rtol=2e-4, atol=2e-5)


def test_rdma_pipelined_race_detector_clean():
    """The pipelined schedule (parity-alternating mailboxes, conditional
    replacement communication) must also pass the happens-before race
    detector — including a run long enough to fire a residual
    replacement."""
    from jax._src.pallas.mosaic.interpret import interpret_pallas_call as ipc

    n, K, d = 4, 16, 4
    S, g = _system(n, K, seed=41)
    Pb = precond.build(S, "block_jacobi").blocks  # weaker -> more iters
    params = pltpu.InterpretParams(detect_races=True)
    res = pcg_rdma_sharded(S.blocks, Pb, g, jnp.zeros_like(g),
                           mesh=_mesh(d), exit_tol=1e-9, max_iter=100,
                           method="pipelined", interpret_params=params)
    jax.block_until_ready(res.lam)
    assert bool(res.converged)
    assert int(res.iters) > 16  # at least one replacement fired
    assert ipc.races is not None and not ipc.races.races_found


def test_rdma_rejects_undividable_k():
    n, K = 4, 18
    S, g = _system(n, K)
    Pb = precond.build(S, "block_jacobi").blocks
    with pytest.raises(ValueError, match="divide"):
        pcg_rdma_sharded(S.blocks, Pb, g, jnp.zeros_like(g),
                         mesh=_mesh(4), exit_tol=1e-6, max_iter=10,
                         interpret_params=INTERP)


def test_rdma_single_device_degenerate():
    """D=1: the ring collapses to self-sends and both chain-end masks fire
    — the kernel must still reproduce the oracle (the degenerate base case
    of the induction the A/B schedule's safety argument rests on)."""
    n, K = 4, 8
    S, g = _system(n, K, seed=51)
    Pb = precond.build(S, "symmetric_stair").blocks
    res = pcg_rdma_sharded(S.blocks, Pb, g, jnp.zeros_like(g),
                           mesh=_mesh(1), exit_tol=1e-8, max_iter=200,
                           interpret_params=INTERP)
    ref = jnp_backend.pcg_jnp(S.blocks, Pb, g, jnp.zeros_like(g),
                              exit_tol=1e-8, max_iter=200)
    assert bool(res.converged)
    assert abs(int(res.iters) - int(ref.iters)) <= 1
    np.testing.assert_allclose(np.asarray(res.lam), np.asarray(ref.lam),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("d", [2, 4, 8])
@pytest.mark.parametrize("pre", ["identity", "block_jacobi",
                                 "symmetric_stair"])
def test_rdma_in_kernel_precond_matches_oracle(pre, d):
    """Round-3 parity (VERDICT r2 item 2): identity and IN-KERNEL
    block_jacobi / symmetric_stair construction — no prebuilt Pinv
    operand at all — against the jnp oracle with the same (externally
    built) preconditioner."""
    n, K = 5, 32
    S, g = _system(n, K, seed=60 + d)
    lam0 = jnp.zeros_like(g)
    res = pcg_rdma_sharded(S.blocks, None, g, lam0, mesh=_mesh(d),
                           exit_tol=1e-7, max_iter=300, precond=pre,
                           interpret_params=INTERP)
    identity = pre == "identity"
    pb = S.blocks if identity else precond.build(S, pre).blocks
    ref = jnp_backend.pcg_jnp(S.blocks, pb, g, lam0, exit_tol=1e-7,
                              max_iter=300, identity_pinv=identity)
    assert bool(res.converged) and bool(ref.converged)
    assert abs(int(res.iters) - int(ref.iters)) <= 1
    np.testing.assert_allclose(np.asarray(res.lam), np.asarray(ref.lam),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("pre", ["identity", "symmetric_stair"])
def test_rdma_in_kernel_precond_pipelined(pre):
    from tpcg.solver.pipelined import pcg_pipelined_jnp

    n, K, d = 5, 32, 4
    S, g = _system(n, K, seed=71)
    lam0 = jnp.zeros_like(g)
    res = pcg_rdma_sharded(S.blocks, None, g, lam0, mesh=_mesh(d),
                           exit_tol=1e-7, max_iter=300, precond=pre,
                           method="pipelined", interpret_params=INTERP)
    identity = pre == "identity"
    pb = S.blocks if identity else precond.build(S, pre).blocks
    ref = pcg_pipelined_jnp(S.blocks, pb, g, lam0, exit_tol=1e-7,
                            max_iter=300, identity_pinv=identity)
    assert bool(res.converged) and bool(ref.converged)
    assert abs(int(res.iters) - int(ref.iters)) <= 1
    np.testing.assert_allclose(np.asarray(res.lam), np.asarray(ref.lam),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("method", ["classic", "pipelined"])
def test_rdma_in_kernel_precond_race_detector_clean(method):
    """The elided apply-site exchanges (identity/block_jacobi) and the
    stair apply's w-exchange reshuffle the trace-time A/B buffer
    assignment — the happens-before detector must stay clean for both
    loop forms with the in-kernel stair construction."""
    from jax._src.pallas.mosaic.interpret import interpret_pallas_call as ipc

    n, K, d = 4, 16, 4
    S, g = _system(n, K, seed=80)
    params = pltpu.InterpretParams(detect_races=True)
    res = pcg_rdma_sharded(S.blocks, None, g, jnp.zeros_like(g),
                           mesh=_mesh(d), exit_tol=1e-7, max_iter=100,
                           precond="symmetric_stair", method=method,
                           interpret_params=params)
    jax.block_until_ready(res.lam)
    assert bool(res.converged)
    assert ipc.races is not None and not ipc.races.races_found


def test_rdma_routed_from_pcg_solve_sharded():
    """comm='rdma' on the public sharded entry point (previously the RDMA
    kernel was reachable only by importing the module)."""
    from tpcg.parallel.knot_sharded import pcg_solve_sharded
    from tpcg.types import PCGConfig

    n, K, d = 4, 16, 4
    S, g = _system(n, K, seed=91)
    cfg = PCGConfig(exit_tol=1e-7, max_iter=200,
                    preconditioner="symmetric_stair")
    res = pcg_solve_sharded(S, g, mesh=_mesh(d), config=cfg, comm="rdma",
                            interpret_params=INTERP)
    ref = pcg_solve_sharded(S, g, mesh=_mesh(d), config=cfg)
    assert bool(res.converged) and bool(ref.converged)
    assert abs(int(res.iters) - int(ref.iters)) <= 1
    np.testing.assert_allclose(np.asarray(res.lam), np.asarray(ref.lam),
                               rtol=2e-4, atol=2e-5)


def test_rdma_identity_rejects_pinv_operand():
    n, K = 4, 16
    S, g = _system(n, K)
    Pb = precond.build(S, "block_jacobi").blocks
    with pytest.raises(ValueError, match="must be None"):
        pcg_rdma_sharded(S.blocks, Pb, g, jnp.zeros_like(g),
                         mesh=_mesh(2), exit_tol=1e-6, max_iter=10,
                         precond="block_jacobi", interpret_params=INTERP)


def _fleet(B, n, K, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K).blocks
                        for k in keys])
    g = jax.random.normal(jax.random.PRNGKey(seed + 100), (B, K, n),
                          jnp.float32)
    return blocks, g


@pytest.mark.parametrize("d", [2, 4])
@pytest.mark.parametrize("pre", ["identity", "symmetric_stair"])
def test_rdma_fleet_matches_per_system(pre, d):
    """Fleet (batch x knot) RDMA kernel: per-system parity with
    independent jnp solves, in-kernel preconditioners included."""
    from tpcg.parallel.rdma_knot import pcg_rdma_sharded_batched
    from tpcg.types import BlockTridiag

    B, n, K = 4, 4, 16
    blocks, g = _fleet(B, n, K, seed=7 * d)
    lam0 = jnp.zeros_like(g)
    res = pcg_rdma_sharded_batched(
        blocks, None, g, lam0, mesh=_mesh(d), exit_tol=1e-7, max_iter=300,
        precond=pre, interpret_params=INTERP)
    for b in range(B):
        identity = pre == "identity"
        pb = (blocks[b] if identity
              else precond.build(BlockTridiag(blocks[b]), pre).blocks)
        r1 = jnp_backend.pcg_jnp(blocks[b], pb, g[b], lam0[b],
                                 exit_tol=1e-7, max_iter=300,
                                 identity_pinv=identity)
        assert bool(res.converged[b]) and bool(r1.converged)
        # packed segmented dots + fixed-order mailbox reduce: +-2 slack
        assert abs(int(res.iters[b]) - int(r1.iters)) <= 2, f"system {b}"
        np.testing.assert_allclose(np.asarray(res.lam[b]),
                                   np.asarray(r1.lam), rtol=2e-4,
                                   atol=2e-5)


def test_rdma_fleet_pipelined_and_explicit():
    from tpcg.parallel.rdma_knot import pcg_rdma_sharded_batched
    from tpcg.solver.pipelined import pcg_pipelined_jnp
    from tpcg.types import BlockTridiag

    B, n, K, d = 4, 4, 16, 4
    blocks, g = _fleet(B, n, K, seed=31)
    lam0 = jnp.zeros_like(g)
    Pb = jnp.stack([precond.build(BlockTridiag(blocks[b]),
                                  "block_jacobi").blocks
                    for b in range(B)])
    res = pcg_rdma_sharded_batched(
        blocks, Pb, g, lam0, mesh=_mesh(d), exit_tol=1e-7, max_iter=300,
        method="pipelined", interpret_params=INTERP)
    for b in range(B):
        r1 = pcg_pipelined_jnp(blocks[b], Pb[b], g[b], lam0[b],
                               exit_tol=1e-7, max_iter=300)
        assert bool(res.converged[b])
        assert abs(int(res.iters[b]) - int(r1.iters)) <= 2
        np.testing.assert_allclose(np.asarray(res.lam[b]),
                                   np.asarray(r1.lam), rtol=2e-3,
                                   atol=2e-4)


def test_rdma_fleet_freeze_and_guard():
    """Freeze-mask discipline across devices: a zero-rhs system reports 0
    iterations; with stop_on_nonfinite a poisoned (S=0) system freezes
    with converged=False while the rest of the fleet solves on."""
    from tpcg.parallel.rdma_knot import pcg_rdma_sharded_batched

    B, n, K, d = 4, 4, 16, 4
    blocks, g = _fleet(B, n, K, seed=43)
    blocks = blocks.at[2].set(0.0)
    g = g.at[0].set(0.0)
    lam0 = jnp.zeros_like(g)
    res = pcg_rdma_sharded_batched(
        blocks, None, g, lam0, mesh=_mesh(d), exit_tol=1e-7, max_iter=150,
        precond="identity", stop_on_nonfinite=True,
        interpret_params=INTERP)
    assert int(res.iters[0]) == 0 and bool(res.converged[0])
    assert np.all(np.asarray(res.lam[0]) == 0)
    assert not bool(res.converged[2]) and int(res.iters[2]) < 150
    for b in (1, 3):
        assert bool(res.converged[b]), f"system {b}"
        assert np.all(np.isfinite(np.asarray(res.lam[b])))


def test_rdma_fleet_race_detector_clean():
    from jax._src.pallas.mosaic.interpret import interpret_pallas_call as ipc

    from tpcg.parallel.rdma_knot import pcg_rdma_sharded_batched

    B, n, K, d = 2, 3, 8, 2
    blocks, g = _fleet(B, n, K, seed=57)
    params = pltpu.InterpretParams(detect_races=True)
    res = pcg_rdma_sharded_batched(
        blocks, None, g, jnp.zeros_like(g), mesh=_mesh(d), exit_tol=1e-7,
        max_iter=100, precond="symmetric_stair",
        interpret_params=params)
    jax.block_until_ready(res.lam)
    assert bool(np.asarray(res.converged).all())
    assert ipc.races is not None and not ipc.races.races_found
