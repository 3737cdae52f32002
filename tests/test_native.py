"""Native C++ host library tests: the ctypes path and the numpy fallback
must agree bit-for-bit (the library is built by `make -C csrc`; tests skip
native-vs-fallback comparison when unbuilt but always test the fallback)."""

import numpy as np
import pytest

from tpcg.utils import native
from tpcg.models import golden


def test_refflat_roundtrip_matches_layout():
    flat = np.asarray(golden._S_FLAT, dtype=np.float64)
    blocks = native.refflat_to_cbtd(flat, 2, 3)
    assert blocks.shape == (3, 3, 2, 2)
    # diag of row 0: column-major [-0.999, 0, 0, -0.999] -> symmetric here
    np.testing.assert_allclose(blocks[0, 1], [[-.999, 0], [0, -.999]])
    # right of row 0 column-major [.999,.0999,-.98,.999]
    np.testing.assert_allclose(blocks[0, 2], [[.999, -.98], [.0999, .999]])


def test_csr_native_equals_fallback(rng):
    n, K = 3, 5
    blocks = rng.standard_normal((K, 3, n, n))
    blocks[0, 0] = 0
    blocks[-1, 2] = 0
    from tpcg.layout import cbtd_to_dense
    import jax.numpy as jnp

    A = np.asarray(cbtd_to_dense(jnp.asarray(blocks)))
    rows, cols = np.nonzero(A)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    val = A[rows, cols]
    row_ptr = np.zeros(A.shape[0] + 1, dtype=np.int64)
    np.add.at(row_ptr, rows + 1, 1)
    row_ptr = np.cumsum(row_ptr)

    got_fallback = native._csr_to_cbtd_numpy(row_ptr, cols.astype(np.int64),
                                             val, n, K)
    np.testing.assert_allclose(got_fallback, blocks, atol=1e-14)
    if native.have_native():
        got_native = native.csr_to_cbtd(row_ptr, cols.astype(np.int64), val,
                                        n, K)
        np.testing.assert_array_equal(got_native, got_fallback)


@pytest.mark.skipif(not native.have_native(), reason="libtpcg_host not built")
def test_native_validate():
    blocks = np.zeros((4, 3, 2, 2))
    blocks[:, 1] = np.eye(2)
    assert native.validate_cbtd(blocks) == 0
    bad_pad = blocks.copy()
    bad_pad[0, 0, 0, 0] = 1.0
    assert native.validate_cbtd(bad_pad) == 1
    asym = blocks.copy()
    asym[0, 2, 0, 1] = 2.0  # right block of row 0 not matched by left of 1
    assert native.validate_cbtd(asym) == 3


def test_validate_fallback_matches_native():
    blocks = np.zeros((3, 3, 2, 2))
    blocks[:, 1] = np.eye(2)
    blocks[0, 2] = [[1.0, 2.0], [3.0, 4.0]]
    blocks[1, 0] = blocks[0, 2].T
    codes = [native.validate_cbtd(blocks)]
    blocks2 = blocks.copy()
    blocks2[1, 0, 0, 0] += 5.0
    codes.append(native.validate_cbtd(blocks2))
    assert codes == [0, 3]


@pytest.mark.skipif(not native.have_native(), reason="libtpcg_host not built")
def test_native_csr_rejects_off_band():
    row_ptr = np.array([0, 1, 1, 1, 1, 1, 1], dtype=np.int64)
    col_ind = np.array([5], dtype=np.int64)
    val = np.array([2.0])
    with pytest.raises(ValueError, match="band"):
        native.csr_to_cbtd(row_ptr, col_ind, val, 2, 3)


def test_dense_to_cbtd_native_and_fallback(rng):
    n, K = 3, 4
    blocks = rng.standard_normal((K, 3, n, n))
    blocks[0, 0] = 0
    blocks[-1, 2] = 0
    from tpcg.layout import cbtd_to_dense
    import jax.numpy as jnp

    A = np.asarray(cbtd_to_dense(jnp.asarray(blocks)))
    got = native.dense_to_cbtd(A, n, K)
    np.testing.assert_allclose(got, blocks, atol=1e-14)
    bad = A.copy()
    bad[0, -1] = 5.0
    import pytest

    with pytest.raises(ValueError, match="band"):
        native.dense_to_cbtd(bad, n, K)
