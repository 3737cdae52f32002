"""Parity of the lane-major unrolled Cholesky helpers (tpcg/ops/lanelin)
against jnp.linalg on random SPD stacks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpcg.ops import lanelin


def _spd_stack(key, B, n, dtype=jnp.float32):
    L = jax.random.normal(key, (B, n, n), dtype) * 0.4
    return jnp.einsum('bij,bkj->bik', L, L) + 1.2 * jnp.eye(n, dtype=dtype)


@pytest.mark.parametrize("n", [1, 2, 7, 14])
def test_spd_inverse_parity(n):
    M = _spd_stack(jax.random.PRNGKey(n), 9, n)
    got = np.asarray(jax.jit(lanelin.spd_inverse)(M))
    with jax.default_matmul_precision("highest"):
        want = np.asarray(jnp.linalg.inv(M))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("n", [2, 7, 14])
def test_spd_solve_parity(n):
    key = jax.random.PRNGKey(100 + n)
    M = _spd_stack(key, 6, n)
    rhs = jax.random.normal(jax.random.PRNGKey(1), (6, n), jnp.float32)
    got = np.asarray(jax.jit(lanelin.spd_solve)(M, rhs))
    with jax.default_matmul_precision("highest"):
        want = np.asarray(jnp.linalg.solve(M, rhs[..., None])[..., 0])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("n", [2, 6, 14])
def test_negative_definite_parity(n):
    """The golden reference Schur system's diagonal blocks are NEGATIVE
    definite (PCG is sign-invariant) — the root-free LDL^T must invert
    them; a Cholesky (sqrt) formulation NaNs here."""
    M = -_spd_stack(jax.random.PRNGKey(40 + n), 7, n)
    got = np.asarray(jax.jit(lanelin.spd_inverse)(M))
    assert np.isfinite(got).all()
    with jax.default_matmul_precision("highest"):
        want = np.asarray(jnp.linalg.inv(M))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_leading_batch_dims():
    M = _spd_stack(jax.random.PRNGKey(5), 12, 5).reshape(3, 4, 5, 5)
    got = np.asarray(lanelin.spd_inverse(M))
    with jax.default_matmul_precision("highest"):
        want = np.asarray(jnp.linalg.inv(M))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_identity_roundtrip():
    M = _spd_stack(jax.random.PRNGKey(9), 4, 14)
    inv = lanelin.spd_inverse(M)
    eye = np.einsum('bij,bjk->bik', np.asarray(M), np.asarray(inv))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(14), eye.shape),
                               atol=5e-5)


def test_matmul_lane_parity():
    A = jax.random.normal(jax.random.PRNGKey(0), (5, 7, 13), jnp.float32)
    B = jax.random.normal(jax.random.PRNGKey(1), (7, 4, 13), jnp.float32)
    got = np.asarray(lanelin.matmul_lane(A, B))
    want = np.einsum('ikb,kjb->ijb', np.asarray(A), np.asarray(B))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_symmetric_stair_lane_major_parity():
    """The lane-major stair build must match the einsum fallback exactly
    (same arithmetic, different layout), single and batched, including
    the negative-definite golden system."""
    import tpcg
    from tpcg import precond
    from tpcg.models import golden
    from tpcg.types import BlockTridiag

    S1 = tpcg.random_spd_cbtd(jax.random.PRNGKey(0), 14, 16)
    np.testing.assert_allclose(
        np.asarray(precond.symmetric_stair(S1).blocks),
        np.asarray(precond._symmetric_stair_einsum(S1).blocks),
        rtol=2e-5, atol=2e-6)
    Sb = BlockTridiag(jnp.stack(
        [tpcg.random_spd_cbtd(jax.random.PRNGKey(i), 6, 9).blocks
         for i in range(4)]))
    np.testing.assert_allclose(
        np.asarray(precond.symmetric_stair(Sb).blocks),
        np.asarray(precond._symmetric_stair_einsum(Sb).blocks),
        rtol=2e-5, atol=2e-6)
    Sg, _, _ = golden.system()
    np.testing.assert_allclose(
        np.asarray(precond.symmetric_stair(Sg).blocks),
        np.asarray(precond._symmetric_stair_einsum(Sg).blocks),
        rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("levels,band", [(1, None), (2, 5), (1, 2)])
def test_stair_refined_lane_major_parity(levels, band):
    """stair_refined's lane-major build pipeline (banded_mm_lm et al.) must
    match the einsum pipeline it replaced."""
    import tpcg
    from tpcg import precond
    from tpcg.layout import zero_pad_slots
    from tpcg.ops import banded

    S = tpcg.random_spd_cbtd(jax.random.PRNGKey(levels), 7, 12)
    got = precond.stair_refined(S, levels=levels, band=band).pages
    exact = 2 * levels + 1
    b = exact if band is None else band
    M = precond.symmetric_stair(S).blocks
    P = M
    with jax.default_matmul_precision("highest"):
        for _ in range(levels):
            SP = banded.banded_mm(zero_pad_slots(S.blocks), P, out_band=b + 1)
            MSP = banded.banded_mm(M, SP, out_band=b)
            P = banded.banded_add(banded.banded_add(M, P), MSP, 1.0, -1.0)
            P = banded.truncate_band(P, b)
        if b < exact:
            P = banded.symmetrize(P)
    np.testing.assert_allclose(np.asarray(got), np.asarray(P),
                               rtol=2e-5, atol=2e-6)


def test_differentiable():
    """Layers above differentiate through assemblies that use these
    helpers. ``spd_inverse`` only reads the lower triangle (Cholesky), so
    raw dL/dM differs from linalg's by a triangle fold — but through any
    SYMMETRIC construction M(theta) (the only valid use: SPD inputs) the
    total derivative must match."""
    L0 = jax.random.normal(jax.random.PRNGKey(2), (3, 7, 7), jnp.float32)

    def build(L_):
        return (jnp.einsum('bij,bkj->bik', L_, L_)
                + 1.5 * jnp.eye(7, dtype=L_.dtype))

    g = jax.grad(lambda L_: jnp.sum(lanelin.spd_inverse(build(L_))))(L0)
    with jax.default_matmul_precision("highest"):
        g_ref = jax.grad(
            lambda L_: jnp.sum(jnp.linalg.inv(build(L_))))(L0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=3e-3, atol=3e-3)
