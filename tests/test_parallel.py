"""Multi-device tests on the 8-device virtual CPU mesh (conftest.py):
knot-axis sharding (ppermute halos + psum dots) and batch sharding must
reproduce the single-device solve exactly in structure and to fp tolerance
in values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from tpcg import BlockTridiag, PCGConfig, layout, precond
from tpcg.parallel.batch_sharded import pcg_solve_batch_sharded
from tpcg.parallel.knot_sharded import (bdmv_knot_sharded, pcg_solve_sharded)
from tpcg.ops.bdmv import bdmv
from tpcg.solver import jnp_backend


def _mesh(n, name):
    devs = jax.devices()[:n]
    return Mesh(np.array(devs), (name,))


def test_eight_virtual_devices():
    assert len(jax.devices()) >= 8, (
        "conftest must provide 8 virtual CPU devices")


@pytest.mark.parametrize("nd", [2, 4, 8])
def test_bdmv_knot_sharded_matches(nd, rng):
    n, K = 5, 32
    bt = layout.random_spd_cbtd(jax.random.PRNGKey(nd), n, K,
                                dtype=jnp.float64)
    x = jnp.asarray(rng.standard_normal((K, n)))
    mesh = _mesh(nd, "knot")
    y_sharded = jax.jit(jax.shard_map(
        lambda b, v: bdmv_knot_sharded(b, v, "knot", nd),
        mesh=mesh, in_specs=(P("knot"), P("knot")), out_specs=P("knot"),
        check_vma=False))(bt.blocks, x)
    np.testing.assert_allclose(np.asarray(y_sharded),
                               np.asarray(bdmv(bt.blocks, x)), atol=1e-12)


@pytest.mark.parametrize("pre", ["identity", "symmetric_stair"])
@pytest.mark.parametrize("nd", [2, 8])
def test_knot_sharded_solve_matches_single(pre, nd):
    n, K = 6, 64
    S = layout.random_spd_cbtd(jax.random.PRNGKey(3), n, K,
                               dtype=jnp.float64)
    gamma = jnp.ones((K, n), jnp.float64)
    cfg = PCGConfig(exit_tol=1e-12, max_iter=300, preconditioner=pre)
    mesh = _mesh(nd, "knot")
    res_sh = pcg_solve_sharded(S, gamma, mesh=mesh, config=cfg)
    # single-device oracle
    identity = pre == "identity"
    pb = S.blocks if identity else precond.build(S, pre).blocks
    res_1 = jnp_backend.pcg_jnp(S.blocks, pb, gamma, jnp.zeros_like(gamma),
                                exit_tol=1e-12, max_iter=300,
                                identity_pinv=identity)
    assert bool(res_sh.converged)
    assert int(res_sh.iters) == int(res_1.iters)
    np.testing.assert_allclose(np.asarray(res_sh.lam), np.asarray(res_1.lam),
                               rtol=1e-9, atol=1e-10)


def test_knot_sharded_rejects_indivisible():
    S = layout.random_spd_cbtd(jax.random.PRNGKey(0), 3, 10,
                               dtype=jnp.float64)
    mesh = _mesh(4, "knot")
    with pytest.raises(ValueError, match="divisible"):
        pcg_solve_sharded(S, jnp.ones((10, 3), jnp.float64), mesh=mesh)


@pytest.mark.parametrize("nd", [2, 4])
def test_batch_sharded_matches_loop(nd, rng):
    B, n, K = 8, 4, 16
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K,
                                               dtype=jnp.float64).blocks
                        for k in keys])
    gamma = jnp.asarray(rng.standard_normal((B, K, n)))
    cfg = PCGConfig(exit_tol=1e-12, max_iter=200,
                    preconditioner="block_jacobi")
    mesh = _mesh(nd, "batch")
    res = pcg_solve_batch_sharded(BlockTridiag(blocks), gamma, mesh=mesh,
                                  config=cfg)
    pb = precond.build(BlockTridiag(blocks), "block_jacobi").blocks
    for b in range(B):
        r1 = jnp_backend.pcg_jnp(blocks[b], pb[b], gamma[b],
                                 jnp.zeros_like(gamma[b]),
                                 exit_tol=1e-12, max_iter=200)
        assert int(res.iters[b]) == int(r1.iters)
        np.testing.assert_allclose(np.asarray(res.lam[b]),
                                   np.asarray(r1.lam), atol=1e-9)


def test_knot_sharded_batched_2d_mesh(rng):
    """2D mesh (batch x knot): per-system results must match independent
    single-device solves exactly in iteration counts."""
    from tpcg.parallel.knot_sharded import pcg_knot_sharded_batched
    from jax.sharding import NamedSharding

    B, n, K = 4, 4, 16
    keys = jax.random.split(jax.random.PRNGKey(11), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K,
                                               dtype=jnp.float64).blocks
                        for k in keys])
    gamma = jnp.asarray(rng.standard_normal((B, K, n)))
    lam0 = jnp.zeros_like(gamma)
    pb = precond.build(BlockTridiag(blocks), "block_jacobi").blocks

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("batch", "knot"))
    shard = NamedSharding(mesh, P("batch", "knot"))
    args = [jax.device_put(x, shard) for x in (blocks, pb, gamma, lam0)]
    res = pcg_knot_sharded_batched(*args, mesh=mesh,
                                   exit_tol=1e-12, max_iter=300)
    assert np.all(np.asarray(res.converged))
    for b in range(B):
        r1 = jnp_backend.pcg_jnp(blocks[b], pb[b], gamma[b], lam0[b],
                                 exit_tol=1e-12, max_iter=300)
        assert int(res.iters[b]) == int(r1.iters)
        np.testing.assert_allclose(np.asarray(res.lam[b]),
                                   np.asarray(r1.lam), atol=1e-9)


def test_batch_sharded_pallas_interpret():
    B, n, K = 4, 3, 8
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K,
                                               dtype=jnp.float32).blocks
                        for k in keys])
    gamma = jnp.ones((B, K, n), jnp.float32)
    mesh = _mesh(2, "batch")
    res = pcg_solve_batch_sharded(
        BlockTridiag(blocks), gamma, mesh=mesh,
        config=PCGConfig(exit_tol=1e-7, max_iter=100),
        backend="pallas", interpret=True)
    assert np.all(np.asarray(res.converged))
    for b in range(B):
        x_true = np.linalg.solve(
            np.asarray(BlockTridiag(blocks[b]).dense(), np.float64),
            np.ones(K * n))
        np.testing.assert_allclose(np.asarray(res.lam[b]).reshape(-1),
                                   x_true, rtol=1e-3, atol=1e-4)


def test_knot_sharded_pipelined_matches_single():
    """Pipelined method under shard_map (one psum per iteration) must match
    the single-device pipelined oracle."""
    from tpcg.solver.pipelined import pcg_pipelined_jnp

    n, K = 5, 32
    S = layout.random_spd_cbtd(jax.random.PRNGKey(21), n, K,
                               dtype=jnp.float64)
    gamma = jnp.ones((K, n), jnp.float64)
    cfg = PCGConfig(exit_tol=1e-12, max_iter=300,
                    preconditioner="block_jacobi", method="pipelined")
    mesh = _mesh(4, "knot")
    res_sh = pcg_solve_sharded(S, gamma, mesh=mesh, config=cfg)
    pb = precond.build(S, "block_jacobi").blocks
    res_1 = pcg_pipelined_jnp(S.blocks, pb, gamma, jnp.zeros_like(gamma),
                              exit_tol=1e-12, max_iter=300)
    assert bool(res_sh.converged)
    assert int(res_sh.iters) == int(res_1.iters)
    np.testing.assert_allclose(np.asarray(res_sh.lam), np.asarray(res_1.lam),
                               rtol=1e-9, atol=1e-10)


def test_fleet_with_already_converged_system(rng):
    """A fleet member converged at entry (zero rhs, zero warm start) must
    come back with lam=0 / iters=0 — NOT NaN from a masked 0*(0/0) update
    (regression for the jnp.where fix in pcg_knot_sharded_batched)."""
    from tpcg.parallel.knot_sharded import pcg_knot_sharded_batched
    from jax.sharding import NamedSharding

    B, n, K = 2, 3, 8
    keys = jax.random.split(jax.random.PRNGKey(30), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K,
                                               dtype=jnp.float64).blocks
                        for k in keys])
    gamma = jnp.zeros((B, K, n), jnp.float64).at[1].set(1.0)
    lam0 = jnp.zeros_like(gamma)
    pb = precond.build(BlockTridiag(blocks), "block_jacobi").blocks
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("batch", "knot"))
    shard = NamedSharding(mesh, P("batch", "knot"))
    args = [jax.device_put(x, shard) for x in (blocks, pb, gamma, lam0)]
    res = pcg_knot_sharded_batched(*args, mesh=mesh, exit_tol=1e-12,
                                   max_iter=100)
    assert np.all(np.isfinite(np.asarray(res.lam)))
    assert np.all(np.asarray(res.lam[0]) == 0)
    assert int(res.iters[0]) == 0
    assert bool(res.converged[0]) and bool(res.converged[1])


def test_sharded_stop_on_nonfinite():
    """Config's divergence guard must work through the sharded path."""
    n, K = 3, 8
    blocks = jnp.zeros((K, 3, n, n), jnp.float64)  # singular S
    gamma = jnp.ones((K, n), jnp.float64)
    cfg = PCGConfig(exit_tol=1e-30, max_iter=5000, stop_on_nonfinite=True)
    mesh = _mesh(2, "knot")
    res = pcg_solve_sharded(BlockTridiag(blocks), gamma, mesh=mesh,
                            config=cfg)
    assert not bool(res.converged)
    assert int(res.iters) < 5000


def test_knot_sharded_batched_pipelined_2d_mesh(rng):
    """Pipelined fleet on the 2x4 (batch x knot) mesh: per-system results
    must match the single-device pipelined oracle exactly in iteration
    counts (VERDICT r1 item 8)."""
    from tpcg.parallel.knot_sharded import pcg_knot_sharded_batched
    from tpcg.solver.pipelined import pcg_pipelined_jnp
    from jax.sharding import NamedSharding

    B, n, K = 4, 4, 16
    keys = jax.random.split(jax.random.PRNGKey(41), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K,
                                               dtype=jnp.float64).blocks
                        for k in keys])
    gamma = jnp.asarray(rng.standard_normal((B, K, n)))
    lam0 = jnp.zeros_like(gamma)
    pb = precond.build(BlockTridiag(blocks), "block_jacobi").blocks

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("batch", "knot"))
    shard = NamedSharding(mesh, P("batch", "knot"))
    args = [jax.device_put(x, shard) for x in (blocks, pb, gamma, lam0)]
    res = pcg_knot_sharded_batched(*args, mesh=mesh, exit_tol=1e-12,
                                   max_iter=300, method="pipelined")
    assert np.all(np.asarray(res.converged))
    for b in range(B):
        r1 = pcg_pipelined_jnp(blocks[b], pb[b], gamma[b], lam0[b],
                               exit_tol=1e-12, max_iter=300)
        assert int(res.iters[b]) == int(r1.iters), f"system {b}"
        np.testing.assert_allclose(np.asarray(res.lam[b]),
                                   np.asarray(r1.lam), atol=1e-9)


def test_knot_sharded_batched_stop_on_nonfinite():
    """A diverging fleet member (singular S -> eta NaN) must freeze with
    converged=False without stalling the healthy members."""
    from tpcg.parallel.knot_sharded import pcg_knot_sharded_batched
    from jax.sharding import NamedSharding

    B, n, K = 2, 3, 8
    good = layout.random_spd_cbtd(jax.random.PRNGKey(5), n, K,
                                  dtype=jnp.float64).blocks
    blocks = jnp.stack([jnp.zeros_like(good), good])  # system 0 singular
    gamma = jnp.ones((B, K, n), jnp.float64)
    lam0 = jnp.zeros_like(gamma)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("batch", "knot"))
    shard = NamedSharding(mesh, P("batch", "knot"))
    args = [jax.device_put(x, shard) for x in (blocks, blocks, gamma, lam0)]
    res = pcg_knot_sharded_batched(*args, mesh=mesh, exit_tol=1e-12,
                                   max_iter=5000, identity_pinv=True,
                                   stop_on_nonfinite=True)
    assert not bool(res.converged[0])
    assert bool(res.converged[1])
    assert int(res.iters[1]) < 5000
    # healthy member's solution is real
    x_true = np.linalg.solve(np.asarray(BlockTridiag(good).dense()),
                             np.ones(K * n))
    np.testing.assert_allclose(np.asarray(res.lam[1]).reshape(-1), x_true,
                               rtol=1e-8, atol=1e-9)


def test_knot_sharded_batched_rejects_unknown_method():
    from tpcg.parallel.knot_sharded import pcg_knot_sharded_batched

    n, K = 3, 8
    blocks = jnp.zeros((2, K, 3, n, n), jnp.float64)
    v = jnp.zeros((2, K, n), jnp.float64)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("batch", "knot"))
    with pytest.raises(ValueError, match="method"):
        pcg_knot_sharded_batched(blocks, blocks, v, v, mesh=mesh,
                                 exit_tol=1e-6, max_iter=10,
                                 method="nope")


def test_knot_sharded_precond_refine_matches_oracle():
    """Refined preconditioner under shard_map: iteration count matches the
    single-device refined oracle and drops vs the unrefined solve."""
    from tpcg.parallel.knot_sharded import pcg_knot_sharded

    n, K = 5, 32
    S = layout.random_spd_cbtd(jax.random.PRNGKey(23), n, K,
                               dtype=jnp.float64)
    gamma = jnp.ones((K, n), jnp.float64)
    Pb = precond.build(S, "block_jacobi").blocks
    mesh = _mesh(4, "knot")
    r0 = pcg_knot_sharded(S.blocks, Pb, gamma, jnp.zeros_like(gamma),
                          mesh=mesh, exit_tol=1e-12, max_iter=300)
    r2 = pcg_knot_sharded(S.blocks, Pb, gamma, jnp.zeros_like(gamma),
                          mesh=mesh, exit_tol=1e-12, max_iter=300,
                          precond_refine=2)
    r2_1dev = jnp_backend.pcg_jnp(S.blocks, Pb, gamma,
                                  jnp.zeros_like(gamma), exit_tol=1e-12,
                                  max_iter=300, precond_refine=2)
    assert bool(r2.converged)
    assert int(r2.iters) < int(r0.iters)
    assert int(r2.iters) == int(r2_1dev.iters)
    np.testing.assert_allclose(np.asarray(r2.lam), np.asarray(r2_1dev.lam),
                               rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("method", ["fixed", "fixed_pipelined"])
def test_knot_sharded_fixed_modes(method):
    """Bounded-latency modes over collectives (VERDICT r2 weak #4): a
    STATIC trip count makes identical collective sequences true by
    construction; results must match the corresponding single-core fixed
    oracle and verify convergence post-hoc."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tpcg import layout, precond
    from tpcg.parallel.knot_sharded import pcg_knot_sharded
    from tpcg.solver import jnp_backend
    from tpcg.solver.pipelined import pcg_fixed_pipelined_jnp

    n, K, d, budget = 4, 16, 4, 60
    S = layout.random_spd_cbtd(jax.random.PRNGKey(61), n, K,
                               dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(62), (K, n), jnp.float32)
    Pb = precond.build(S, "symmetric_stair").blocks
    mesh = Mesh(np.array(jax.devices()[:d]), ("knot",))
    sh = NamedSharding(mesh, P("knot"))
    args = [jax.device_put(x, sh)
            for x in (S.blocks, Pb, g, jnp.zeros_like(g))]
    res = pcg_knot_sharded(*args, mesh=mesh, exit_tol=1e-7,
                           max_iter=budget, method=method)
    assert int(res.iters) == budget
    assert bool(res.converged)
    oracle = (pcg_fixed_pipelined_jnp if method == "fixed_pipelined"
              else jnp_backend.pcg_fixed_jnp)
    ref = oracle(S.blocks, Pb, g, jnp.zeros_like(g), exit_tol=1e-7,
                 max_iter=budget)
    # both overran convergence; compare against the true solution
    x = np.linalg.solve(np.asarray(S.dense(), np.float64),
                        np.asarray(g, np.float64).reshape(-1))
    for lam in (res.lam, ref.lam):
        np.testing.assert_allclose(np.asarray(lam).reshape(-1), x,
                                   rtol=5e-3, atol=1e-3)
    with pytest.raises(ValueError, match="per-iteration"):
        pcg_knot_sharded(*args, mesh=mesh, exit_tol=1e-7,
                         max_iter=budget, method=method,
                         stop_on_nonfinite=True)
