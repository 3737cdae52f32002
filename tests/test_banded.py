"""Block-banded algebra (tpcg/ops/banded.py) and the materialized
stair_refined preconditioner (tpcg.precond.stair_refined) — the round-3
strengthened-preconditioner route (fewer iterations at one-banded-SpMV
apply cost)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpcg import BlockTridiag, PCGConfig, layout, pcg_solve, precond
from tpcg.ops import banded
from tpcg.solver import jnp_backend


def _spd(n, K, seed=0, dtype=jnp.float32):
    S = layout.random_spd_cbtd(jax.random.PRNGKey(seed), n, K, dtype=dtype)
    g = jax.random.normal(jax.random.PRNGKey(seed + 1), (K, n), dtype)
    return S, g


def _rand_banded(K, band, n, seed):
    D = 2 * band + 1
    pages = jax.random.normal(jax.random.PRNGKey(seed), (K, D, n, n),
                              jnp.float32)
    return banded.zero_invalid(pages)


def test_banded_mv_matches_dense():
    for band, K, n in [(1, 7, 3), (2, 9, 4), (3, 8, 2)]:
        A = _rand_banded(K, band, n, seed=band)
        x = jax.random.normal(jax.random.PRNGKey(99), (K, n), jnp.float32)
        dense = np.asarray(banded.banded_to_dense(A))
        want = dense @ np.asarray(x).reshape(-1)
        got = np.asarray(banded.banded_mv(A, x)).reshape(-1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_banded_mv_band1_matches_bdmv():
    """band=1 banded layout IS the cbtd layout: banded_mv must agree with
    the solver's bdmv on a canonical cbtd matrix."""
    from tpcg.ops.bdmv import bdmv

    S, g = _spd(4, 9, seed=2)
    got = np.asarray(banded.banded_mv(S.blocks, g))
    want = np.asarray(bdmv(S.blocks, g))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_banded_mm_matches_dense():
    for (ba, bb), K, n in [((1, 1), 8, 3), ((1, 2), 7, 2), ((2, 1), 6, 3)]:
        A = _rand_banded(K, ba, n, seed=10 * ba + bb)
        B = _rand_banded(K, bb, n, seed=20 * ba + bb)
        C = banded.banded_mm(A, B)
        assert banded.band_of(C) == ba + bb
        want = np.asarray(banded.banded_to_dense(A)) @ np.asarray(
            banded.banded_to_dense(B))
        got = np.asarray(banded.banded_to_dense(C))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_banded_mm_truncation_matches_dense_band():
    A = _rand_banded(8, 1, 3, seed=1)
    B = _rand_banded(8, 1, 3, seed=2)
    C = banded.banded_mm(A, B, out_band=1)
    full = np.asarray(banded.banded_to_dense(banded.banded_mm(A, B)))
    # zero outside the kept band, block-wise
    n, K = 3, 8
    kept = np.zeros_like(full)
    for k in range(K):
        for j in range(max(0, k - 1), min(K, k + 2)):
            kept[k * n:(k + 1) * n, j * n:(j + 1) * n] = \
                full[k * n:(k + 1) * n, j * n:(j + 1) * n]
    np.testing.assert_allclose(np.asarray(banded.banded_to_dense(C)), kept,
                               rtol=1e-4, atol=1e-4)


def test_banded_transpose_matches_dense():
    A = _rand_banded(7, 2, 3, seed=5)
    got = np.asarray(banded.banded_to_dense(banded.banded_transpose(A)))
    want = np.asarray(banded.banded_to_dense(A)).T
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_banded_mv_lane_major_matches_canonical():
    from tpcg.ops.bdmv import to_lane_major

    for band in (1, 2, 3):
        K, n = 16, 4
        A = _rand_banded(K, band, n, seed=30 + band)
        x = jax.random.normal(jax.random.PRNGKey(31), (K, n), jnp.float32)
        want = np.asarray(banded.banded_mv(A, x))
        got_lm = banded.banded_mv_lane_major(to_lane_major(A),
                                             jnp.swapaxes(x, -1, -2), n, K)
        np.testing.assert_allclose(np.asarray(got_lm).T, want, rtol=1e-5,
                                   atol=1e-5)


def test_stair_refined_level1_is_exact_polynomial():
    """P_1 = 2M - MSM exactly (dense check), band 3, symmetric."""
    S, _ = _spd(3, 8, seed=7)
    P = precond.stair_refined(S, levels=1)
    assert P.band == 3
    M = np.asarray(precond.build(S, "symmetric_stair").dense())
    Sd = np.asarray(S.dense())
    want = 2 * M - M @ Sd @ M
    got = np.asarray(P.dense())
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got, got.T, rtol=1e-5, atol=1e-6)


def test_stair_refined_truncated_stays_symmetric():
    S, _ = _spd(3, 10, seed=8)
    P = precond.stair_refined(S, levels=2, band=2)
    assert P.band == 2
    d = np.asarray(P.dense())
    np.testing.assert_allclose(d, d.T, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("levels,band", [(1, None), (1, 2), (2, 3)])
def test_stair_refined_cuts_iterations(levels, band):
    """The materialized refined preconditioner must match the ITERATION
    COUNT of the equivalent apply-time Neumann refinement (same effective
    operator when untruncated) and beat plain symmetric-stair."""
    S, g = _spd(6, 32, seed=11)
    l0 = jnp.zeros_like(g)
    Mb = precond.build(S, "symmetric_stair").blocks
    base = jnp_backend.pcg_jnp(S.blocks, Mb, g, l0, exit_tol=1e-7,
                               max_iter=400)
    Pb = precond.stair_refined(S, levels=levels, band=band).blocks
    ref = jnp_backend.pcg_jnp(S.blocks, Pb, g, l0, exit_tol=1e-7,
                              max_iter=400)
    assert bool(ref.converged)
    assert int(ref.iters) < int(base.iters)
    if band is None:  # untruncated: same operator as apply-time refine
        neu = jnp_backend.pcg_jnp(S.blocks, Mb, g, l0, exit_tol=1e-7,
                                  max_iter=400, precond_refine=levels)
        assert abs(int(ref.iters) - int(neu.iters)) <= 1
    # solution correctness
    x = np.linalg.solve(np.asarray(S.dense()),
                        np.asarray(g).reshape(-1))
    np.testing.assert_allclose(np.asarray(ref.lam).reshape(-1), x,
                               rtol=2e-3, atol=2e-4)


def test_stair_refined_through_public_api_jnp_and_pallas():
    """PCGConfig(preconditioner='stair_refined'): both backends converge to
    the same solution with the same iteration count (+-1) — the banded
    explicit path through the fused kernel (interpret mode off-chip)."""
    from tpcg.solver import pallas_backend

    S, g = _spd(5, 16, seed=13)
    cfg = PCGConfig(exit_tol=1e-7, max_iter=200,
                    preconditioner="stair_refined")
    r_jnp = pcg_solve(S, g, config=cfg, backend="jnp")
    assert bool(r_jnp.converged)
    Pb = precond.stair_refined(S, levels=1).blocks
    r_pal = pallas_backend.pcg_pallas(
        S.blocks, Pb, g, jnp.zeros_like(g), exit_tol=1e-7, max_iter=200,
        interpret=True)
    assert bool(r_pal.converged)
    assert abs(int(r_pal.iters) - int(r_jnp.iters)) <= 1
    np.testing.assert_allclose(np.asarray(r_pal.lam), np.asarray(r_jnp.lam),
                               rtol=2e-4, atol=2e-5)


def test_prebuilt_banded_pinv_through_pcg_solve():
    """The fixed-S workflow: a PREBUILT BlockBanded Pinv passed explicitly
    to pcg_solve must match the config-built stair_refined route exactly.
    Regression: _as_bt used to jnp.asarray the BlockBanded NamedTuple,
    stacking its single field into a bogus leading dim and failing the
    materialize shape check."""
    S, g = _spd(5, 16, seed=13)
    cfg = PCGConfig(exit_tol=1e-7, max_iter=200,
                    preconditioner="stair_refined")
    r_cfg = pcg_solve(S, g, config=cfg, backend="jnp")
    Pb = precond.stair_refined(S, levels=1)
    r_pre = pcg_solve(S, g, config=cfg, Pinv=Pb, backend="jnp")
    assert bool(r_pre.converged)
    assert int(r_pre.iters) == int(r_cfg.iters)
    np.testing.assert_allclose(np.asarray(r_pre.lam),
                               np.asarray(r_cfg.lam), rtol=1e-6, atol=1e-7)
    # raw banded pages (a plain array with D=2*band+1 > 3) are inferred
    # as BlockBanded too
    r_raw = pcg_solve(S, g, config=cfg, Pinv=Pb.pages, backend="jnp")
    assert int(r_raw.iters) == int(r_cfg.iters)


def test_stair_refined_batched_routes_through_grid_kernel():
    """Batched solves with a banded Pinv skip the (cbtd-only) packed kernel
    and run the grid-batched kernel; per-system results match the jnp
    oracle."""
    from tpcg.solver import pallas_backend

    B, n, K = 2, 3, 128  # grid kernel needs K % 128 == 0
    keys = jax.random.split(jax.random.PRNGKey(17), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K).blocks
                        for k in keys])
    gamma = jax.random.normal(jax.random.PRNGKey(18), (B, K, n),
                              jnp.float32)
    lam0 = jnp.zeros_like(gamma)
    Pb = precond.stair_refined(BlockTridiag(blocks), levels=1).blocks
    assert Pb.shape[-3] == 7
    res = pallas_backend.pcg_pallas_batched(
        blocks, Pb, gamma, lam0, exit_tol=1e-6, max_iter=200,
        interpret=True)
    for b in range(B):
        r1 = jnp_backend.pcg_jnp(blocks[b], Pb[b], gamma[b], lam0[b],
                                 exit_tol=1e-6, max_iter=200)
        assert bool(res.converged[b])
        assert abs(int(res.iters[b]) - int(r1.iters)) <= 1
        np.testing.assert_allclose(np.asarray(res.lam[b]),
                                   np.asarray(r1.lam), rtol=2e-4,
                                   atol=2e-5)


def test_stair_refined_batched_lane_packed_route():
    """Banded explicit Pinv through the LANE-PACKED kernel (K % 128 != 0
    forces the pack; the banded `_banded_mv_packed` apply with period-K
    shifts must match per-system jnp solves), including K/B padding of
    D-page operands."""
    from tpcg.solver import pallas_backend

    B, n, K = 3, 4, 12  # B odd, K unaligned: pads both axes
    keys = jax.random.split(jax.random.PRNGKey(29), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K).blocks
                        for k in keys])
    gamma = jax.random.normal(jax.random.PRNGKey(30), (B, K, n),
                              jnp.float32)
    lam0 = jnp.zeros_like(gamma)
    Pb = precond.stair_refined(BlockTridiag(blocks), levels=1).blocks
    assert Pb.shape[-3] == 7
    res = pallas_backend.pcg_pallas_batched(
        blocks, Pb, gamma, lam0, exit_tol=1e-7, max_iter=200,
        interpret=True)
    for b in range(B):
        r1 = jnp_backend.pcg_jnp(blocks[b], Pb[b], gamma[b], lam0[b],
                                 exit_tol=1e-7, max_iter=200)
        assert bool(res.converged[b])
        assert abs(int(res.iters[b]) - int(r1.iters)) <= 1
        np.testing.assert_allclose(np.asarray(res.lam[b]),
                                   np.asarray(r1.lam), rtol=2e-4,
                                   atol=2e-5)


def test_pcg_solve_batched_stair_refined_public_api():
    """pcg_solve_batched(preconditioner='stair_refined'): the batched
    build is vmapped XLA, and both backends agree."""
    import tpcg

    B, n, K = 2, 3, 8
    keys = jax.random.split(jax.random.PRNGKey(31), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K).blocks
                        for k in keys])
    gamma = jax.random.normal(jax.random.PRNGKey(32), (B, K, n),
                              jnp.float32)
    cfg = PCGConfig(exit_tol=1e-7, max_iter=200,
                    preconditioner="stair_refined")
    res = tpcg.pcg_solve_batched(blocks, gamma, config=cfg, backend="jnp")
    assert bool(np.asarray(res.converged).all())
    for b in range(B):
        x = np.linalg.solve(
            np.asarray(BlockTridiag(blocks[b]).dense(), np.float64),
            np.asarray(gamma[b], np.float64).reshape(-1))
        np.testing.assert_allclose(np.asarray(res.lam[b]).reshape(-1), x,
                                   rtol=2e-3, atol=2e-4)
