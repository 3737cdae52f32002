"""Layout converter tests (tpcg/layout.py vs the reference's cbtd contract,
SURVEY.md §2 data layout)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpcg import layout
from tpcg.models import golden


def test_reference_flat_roundtrip():
    S, _, _ = golden.system()
    flat = layout.to_reference_flat(S)
    S2 = layout.from_reference_flat(flat, golden.STATE_SIZE,
                                    golden.KNOT_POINTS)
    np.testing.assert_array_equal(np.asarray(S.blocks), np.asarray(S2.blocks))


def test_golden_symmetry():
    """The golden S must densify to a symmetric matrix — validates the
    column-major-within-block interpretation of the reference layout
    (utils.cuh:62)."""
    S, _, _ = golden.system(dtype=jnp.float64)
    A = np.asarray(S.dense())
    np.testing.assert_allclose(A, A.T, atol=1e-12)
    assert A.shape == (6, 6)


def test_dense_roundtrip(rng):
    K, n = 5, 3
    blocks = rng.standard_normal((K, 3, n, n))
    blocks[0, 0] = 0
    blocks[-1, 2] = 0
    dense = layout.cbtd_to_dense(jnp.asarray(blocks))
    bt = layout.dense_to_cbtd(dense, n)
    np.testing.assert_allclose(np.asarray(bt.blocks), blocks, atol=1e-12)


def test_dense_to_cbtd_rejects_off_band(rng):
    A = np.zeros((6, 6))
    A[0, 5] = 1.0  # block (0, 2) with n=2 -> outside the band
    with pytest.raises(ValueError, match="tridiagonal"):
        layout.dense_to_cbtd(jnp.asarray(A), 2)


def test_from_csr_matches_dense(rng):
    K, n = 4, 2
    bt = layout.random_spd_cbtd(_key(3), n, K, dtype=jnp.float64)
    A = np.asarray(bt.dense())
    row_ptr, col_ind, val = _dense_to_csr(A)
    bt2 = layout.from_csr(row_ptr, col_ind, val, n, K)
    np.testing.assert_allclose(np.asarray(bt2.blocks), np.asarray(bt.blocks),
                               atol=1e-12)


def test_from_csr_rejects_off_band():
    A = np.eye(6)
    A[0, 5] = 2.0
    row_ptr, col_ind, val = _dense_to_csr(A)
    with pytest.raises(ValueError, match="band"):
        layout.from_csr(row_ptr, col_ind, val, 2, 3)


def test_random_spd_is_spd_and_tridiag():
    bt = layout.random_spd_cbtd(_key(0), 4, 6, dtype=jnp.float64)
    A = np.asarray(bt.dense())
    np.testing.assert_allclose(A, A.T, atol=1e-10)
    assert np.all(np.linalg.eigvalsh(A) > 0)


def _key(i):
    import jax

    return jax.random.PRNGKey(i)


def _dense_to_csr(A):
    rows, cols = np.nonzero(A)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    val = A[rows, cols]
    row_ptr = np.zeros(A.shape[0] + 1, dtype=np.int64)
    np.add.at(row_ptr, rows + 1, 1)
    row_ptr = np.cumsum(row_ptr)
    return row_ptr, cols.astype(np.int64), val
