"""Pallas kernel tests vs the jnp oracle, run in interpret mode on CPU
(the TPU-less CI analog of testing device code without a device,
SURVEY.md §4). On real TPU hardware the same kernels compile natively —
see .claude/skills/verify/SKILL.md for the hardware drive."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpcg import PCGConfig, layout, precond
from tpcg.models import golden
from tpcg.ops.bdmv import bdmv, bdmv_pallas
from tpcg.solver import jnp_backend, pallas_backend


@pytest.mark.parametrize("n,K", [(2, 3), (5, 17), (14, 128)])
def test_bdmv_pallas_matches_oracle(n, K, rng):
    bt = layout.random_spd_cbtd(jax.random.PRNGKey(n + K), n, K,
                                dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((K, n)), jnp.float32)
    y_pallas = bdmv_pallas(bt.blocks, x, interpret=True)
    y_oracle = bdmv(bt.blocks, x)
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_oracle),
                               rtol=1e-5, atol=1e-5)


def _solve_both(S, Pinv_blocks, gamma, lam0, tol, max_iter):
    res_p = pallas_backend.pcg_pallas(
        S.blocks, Pinv_blocks, gamma, lam0,
        exit_tol=tol, max_iter=max_iter, interpret=True)
    res_j = jnp_backend.pcg_jnp(
        S.blocks, S.blocks if Pinv_blocks is None else Pinv_blocks,
        gamma, lam0, exit_tol=tol, max_iter=max_iter,
        identity_pinv=Pinv_blocks is None)
    return res_p, res_j


def test_fused_golden_parity():
    S, gamma, lam0 = golden.system(dtype=jnp.float32)
    res_p, res_j = _solve_both(S, None, gamma, lam0, 1e-6, 25)
    assert bool(res_p.converged) and bool(res_j.converged)
    # tolerance-matched parity (SURVEY.md §7 "hard parts"): iteration counts
    # may differ by 1 from fp reduction-order ulps
    assert abs(int(res_p.iters) - int(res_j.iters)) <= 1
    np.testing.assert_allclose(np.asarray(res_p.lam), np.asarray(res_j.lam),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("pre", ["identity", "block_jacobi",
                                 "symmetric_stair"])
def test_fused_random_system_parity(pre):
    n, K = 6, 24
    S = layout.random_spd_cbtd(jax.random.PRNGKey(42), n, K,
                               dtype=jnp.float32)
    gamma = jnp.ones((K, n), jnp.float32)
    lam0 = jnp.zeros_like(gamma)
    pb = None if pre == "identity" else precond.build(S, pre).blocks
    res_p, res_j = _solve_both(S, pb, gamma, lam0, 1e-8, 200)
    assert bool(res_p.converged)
    assert abs(int(res_p.iters) - int(res_j.iters)) <= 2
    np.testing.assert_allclose(np.asarray(res_p.lam), np.asarray(res_j.lam),
                               rtol=1e-3, atol=1e-4)
    # and against the dense truth
    x_true = np.linalg.solve(np.asarray(S.dense(), np.float64),
                             np.ones(K * n))
    np.testing.assert_allclose(np.asarray(res_p.lam).reshape(-1), x_true,
                               rtol=1e-2, atol=1e-3)


def test_fused_max_iter_semantics():
    n, K = 4, 8
    S = layout.random_spd_cbtd(jax.random.PRNGKey(1), n, K,
                               dtype=jnp.float32)
    gamma = jnp.ones((K, n), jnp.float32)
    res = pallas_backend.pcg_pallas(
        S.blocks, None, gamma, jnp.zeros_like(gamma),
        exit_tol=1e-30, max_iter=3, interpret=True)
    assert int(res.iters) == 3
    assert not bool(res.converged)


def test_fused_batched_matches_loop(rng):
    B, n, K = 4, 5, 16
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K,
                                               dtype=jnp.float32).blocks
                        for k in keys])
    gamma = jnp.asarray(rng.standard_normal((B, K, n)), jnp.float32)
    lam0 = jnp.zeros_like(gamma)
    res_b = pallas_backend.pcg_pallas_batched(
        blocks, None, gamma, lam0, exit_tol=1e-8, max_iter=100,
        interpret=True)
    for b in range(B):
        res_1 = pallas_backend.pcg_pallas(
            blocks[b], None, gamma[b], lam0[b], exit_tol=1e-8, max_iter=100,
            interpret=True)
        # +-2: the batched route lane-packs at K=16 and its segmented dot
        # sums lanes in a different order than the single-system vdot; at
        # tol=1e-8 f32 with identity preconditioning that is the eta noise
        # floor, where reduction order flips the exit by a pass or two
        assert abs(int(res_b.iters[b]) - int(res_1.iters)) <= 2
        assert bool(res_b.converged[b]) == bool(res_1.converged)
        np.testing.assert_allclose(np.asarray(res_b.lam[b]),
                                   np.asarray(res_1.lam), rtol=2e-4,
                                   atol=2e-5)


def test_api_batched_jnp_vs_pallas_interpret(rng):
    """pcg_solve_batched: vmapped jnp backend vs grid-batched pallas kernel."""
    from tpcg import BlockTridiag
    from tpcg.solver import api

    B, n, K = 3, 4, 12
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K,
                                               dtype=jnp.float32).blocks
                        for k in keys])
    gamma = jnp.asarray(rng.standard_normal((B, K, n)), jnp.float32)
    cfg = PCGConfig(exit_tol=1e-8, max_iter=100,
                    preconditioner="block_jacobi")
    res_jnp = api.pcg_solve_batched(BlockTridiag(blocks), gamma, config=cfg,
                                    backend="jnp")
    Pinv = precond.build(BlockTridiag(blocks), "block_jacobi")
    res_pal = pallas_backend.pcg_pallas_batched(
        blocks, Pinv.blocks, gamma, jnp.zeros_like(gamma),
        exit_tol=1e-8, max_iter=100, interpret=True)
    assert np.all(np.asarray(res_jnp.converged))
    assert np.all(np.asarray(res_pal.converged))
    np.testing.assert_allclose(np.asarray(res_pal.lam),
                               np.asarray(res_jnp.lam), rtol=1e-3, atol=1e-4)


def test_fused_pipelined_explicit_pinv_interpret():
    """Pipelined method with a caller-provided (explicit) Pinv."""
    n, K = 5, 16
    S = layout.random_spd_cbtd(jax.random.PRNGKey(60), n, K,
                               dtype=jnp.float32)
    gamma = jnp.ones((K, n), jnp.float32)
    Pb = precond.build(S, "block_jacobi").blocks
    res = pallas_backend.pcg_pallas(
        S.blocks, Pb, gamma, jnp.zeros_like(gamma), exit_tol=1e-8,
        max_iter=200, method="pipelined", interpret=True)
    assert bool(res.converged)
    x_true = np.linalg.solve(np.asarray(S.dense(), np.float64),
                             np.ones(K * n))
    np.testing.assert_allclose(np.asarray(res.lam).reshape(-1), x_true,
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("pre", [None, "block_jacobi", "symmetric_stair"])
def test_fused_lean_matches_fast(pre):
    """The lean (ref-sliced, fori-GJ) kernel variant must produce identical
    iteration counts and matching solutions to the fast variant."""
    from tpcg.ops.bdmv import to_lane_major, vec_to_lane_major
    from tpcg.ops.fused_pcg import fused_pcg_lane_major

    n, K = 5, 16
    S = layout.random_spd_cbtd(jax.random.PRNGKey(9), n, K,
                               dtype=jnp.float32)
    S_lm = to_lane_major(S.blocks)
    g = vec_to_lane_major(jnp.ones((K, n), jnp.float32))
    l0 = jnp.zeros_like(g)
    kw = dict(exit_tol=1e-8, max_iter=200, precond=pre, interpret=True)
    fast = fused_pcg_lane_major(S_lm, None, g, l0, lean=False, **kw)
    lean = fused_pcg_lane_major(S_lm, None, g, l0, lean=True, **kw)
    assert bool(fast[2]) and bool(lean[2])
    assert int(fast[1]) == int(lean[1])
    np.testing.assert_allclose(np.asarray(fast[0]), np.asarray(lean[0]),
                               rtol=1e-5, atol=1e-6)


def test_fused_lean_explicit_pinv():
    from tpcg import precond as precond_mod
    from tpcg.ops.bdmv import to_lane_major, vec_to_lane_major
    from tpcg.ops.fused_pcg import fused_pcg_lane_major

    n, K = 4, 12
    S = layout.random_spd_cbtd(jax.random.PRNGKey(10), n, K,
                               dtype=jnp.float32)
    P_lm = to_lane_major(precond_mod.build(S, "block_jacobi").blocks)
    S_lm = to_lane_major(S.blocks)
    g = vec_to_lane_major(jnp.ones((K, n), jnp.float32))
    l0 = jnp.zeros_like(g)
    kw = dict(exit_tol=1e-8, max_iter=200, interpret=True)
    fast = fused_pcg_lane_major(S_lm, P_lm, g, l0, lean=False, **kw)
    lean = fused_pcg_lane_major(S_lm, P_lm, g, l0, lean=True, **kw)
    assert int(fast[1]) == int(lean[1])
    np.testing.assert_allclose(np.asarray(fast[0]), np.asarray(lean[0]),
                               rtol=1e-5, atol=1e-6)


def test_gj_inverse_fori_matches_unrolled(rng):
    from tpcg.ops.smallinv import gj_inverse_lane_major

    n, K = 6, 8
    A = np.asarray(rng.standard_normal((n, n, K)), np.float32)
    A = A + np.transpose(A, (1, 0, 2)) + 4 * np.eye(n, dtype=np.float32)[:, :, None]
    Aj = jnp.asarray(A)
    inv_u = np.asarray(gj_inverse_lane_major(Aj, n, K, unroll=True))
    inv_f = np.asarray(gj_inverse_lane_major(Aj, n, K, unroll=False))
    np.testing.assert_allclose(inv_u, inv_f, rtol=1e-4, atol=1e-5)
    for k in range(K):
        np.testing.assert_allclose(inv_f[:, :, k], np.linalg.inv(A[:, :, k]),
                                   rtol=1e-3, atol=1e-4)


def test_pipelined_replace_every_zero_converges():
    """replace_every=0 (the headline setting with stair_refined): both
    backends converge and match the true solution; the in-loop cadence
    machinery is gone but the adaptive exit still works."""
    import tpcg
    from tpcg import layout

    S = layout.random_spd_cbtd(jax.random.PRNGKey(41), 6, 32,
                               dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(42), (32, 6), jnp.float32)
    cfg = tpcg.PCGConfig(exit_tol=1e-7, max_iter=200,
                         preconditioner="stair_refined",
                         method="pipelined", replace_every=0)
    r_jnp = tpcg.pcg_solve(S, g, config=cfg, backend="jnp")
    assert bool(r_jnp.converged)
    from tpcg import precond
    from tpcg.solver import pallas_backend
    Pb = precond.stair_refined(S, levels=1).blocks
    r_pal = pallas_backend.pcg_pallas(
        S.blocks, Pb, g, jnp.zeros_like(g), exit_tol=1e-7, max_iter=200,
        method="pipelined", replace_every=0, interpret=True)
    assert bool(r_pal.converged)
    x = np.linalg.solve(np.asarray(S.dense(), np.float64),
                        np.asarray(g, np.float64).reshape(-1))
    for r in (r_jnp, r_pal):
        np.testing.assert_allclose(np.asarray(r.lam).reshape(-1), x,
                                   rtol=2e-3, atol=2e-4)
    with pytest.raises(ValueError, match="replace_every"):
        tpcg.PCGConfig(replace_every=-1)
