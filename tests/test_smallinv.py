"""In-kernel small linear algebra (tpcg/ops/smallinv.py) vs numpy, and the
fused build+solve path vs the XLA-built-preconditioner path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpcg import BlockTridiag, layout, precond
from tpcg.ops.bdmv import to_lane_major
from tpcg.ops.smallinv import (blockdiag_mv_lane_major,
                               build_pinv_lane_major,
                               gj_inverse_lane_major, matmul_lane_major)
from tpcg.solver import jnp_backend, pallas_backend


def _rand_spd_stack(key, n, K):
    A = jax.random.normal(key, (K, n, n), jnp.float32)
    return jnp.einsum('kij,kmj->kim', A, A) + 0.5 * jnp.eye(n)


def test_gj_inverse_matches_numpy():
    n, K = 7, 32
    D = _rand_spd_stack(jax.random.PRNGKey(0), n, K)
    D_lm = jnp.transpose(D, (2, 1, 0))  # stored-transpose lane-major
    inv_lm = gj_inverse_lane_major(D_lm, n, K)
    got = np.transpose(np.asarray(inv_lm), (2, 1, 0))
    want = np.linalg.inv(np.asarray(D, np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_matmul_lane_major_matches_numpy():
    n, K = 5, 16
    A = jax.random.normal(jax.random.PRNGKey(1), (n, n, K), jnp.float32)
    B = jax.random.normal(jax.random.PRNGKey(2), (n, n, K), jnp.float32)
    C = matmul_lane_major(A, B, n, K)
    want = np.einsum('rjk,jck->rck', np.asarray(A), np.asarray(B))
    np.testing.assert_allclose(np.asarray(C), want, rtol=1e-5, atol=1e-5)


def test_blockdiag_mv_stored_convention():
    n, K = 4, 8
    D = _rand_spd_stack(jax.random.PRNGKey(3), n, K)  # (K, n, n) math
    x = jax.random.normal(jax.random.PRNGKey(4), (n, K), jnp.float32)
    Dt_lm = jnp.transpose(D, (2, 1, 0))  # [c, r, k]
    y = blockdiag_mv_lane_major(Dt_lm, x, n, K)
    want = np.einsum('krc,ck->rk', np.asarray(D), np.asarray(x))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind", ["block_jacobi", "symmetric_stair"])
def test_build_pinv_matches_xla_builder(kind):
    n, K = 5, 12
    S = layout.random_spd_cbtd(jax.random.PRNGKey(5), n, K,
                               dtype=jnp.float32)
    S_lm = to_lane_major(S.blocks)
    got_lm = build_pinv_lane_major(S_lm, kind, n, K)
    want = precond.build(S, kind).blocks  # (K, 3, n, n) via jnp.linalg.inv
    want_lm = np.asarray(to_lane_major(want))
    np.testing.assert_allclose(np.asarray(got_lm), want_lm, rtol=5e-3,
                               atol=5e-4)


@pytest.mark.parametrize("kind", ["block_jacobi", "symmetric_stair"])
def test_fused_inkernel_build_solve(kind):
    """In-kernel-built preconditioner must solve like the XLA-built one
    (interpret mode; hardware parity checked in the TPU drive)."""
    n, K = 6, 24
    S = layout.random_spd_cbtd(jax.random.PRNGKey(6), n, K,
                               dtype=jnp.float32)
    gamma = jnp.ones((K, n), jnp.float32)
    lam0 = jnp.zeros_like(gamma)
    res_ink = pallas_backend.pcg_pallas(
        S.blocks, None, gamma, lam0, exit_tol=1e-8, max_iter=200,
        precond=kind, interpret=True)
    Pb = precond.build(S, kind).blocks
    res_xla = jnp_backend.pcg_jnp(S.blocks, Pb, gamma, lam0,
                                  exit_tol=1e-8, max_iter=200)
    assert bool(res_ink.converged)
    assert abs(int(res_ink.iters) - int(res_xla.iters)) <= 2
    np.testing.assert_allclose(np.asarray(res_ink.lam),
                               np.asarray(res_xla.lam), rtol=1e-3,
                               atol=1e-4)


def test_api_routes_inkernel_build():
    """pcg_solve with pallas backend + named preconditioner must not require
    an XLA-side Pinv (covered by routing; solves correctly)."""
    from tpcg import PCGConfig, pcg_solve

    n, K = 4, 16
    S = layout.random_spd_cbtd(jax.random.PRNGKey(7), n, K,
                               dtype=jnp.float32)
    gamma = jnp.ones((K, n), jnp.float32)
    # interpret path: route through pallas explicitly on CPU
    from tpcg.solver import pallas_backend as pb
    res = pb.pcg_pallas(S.blocks, None, gamma, jnp.zeros_like(gamma),
                        exit_tol=1e-8, max_iter=200,
                        precond="symmetric_stair", interpret=True)
    x_true = np.linalg.solve(np.asarray(S.dense(), np.float64),
                             np.ones(K * n))
    np.testing.assert_allclose(np.asarray(res.lam).reshape(-1), x_true,
                               rtol=1e-3, atol=1e-3)
