"""Micro-BLAS primitive tests (the GLASS-surface parity layer,
SURVEY.md §2.8) — Pallas kernels in interpret mode vs jnp forms."""

import jax.numpy as jnp
import numpy as np

from tpcg.ops import blas


def test_dot(rng):
    a = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)
    want = float(np.sum(np.asarray(a, np.float64) * np.asarray(b,
                                                               np.float64)))
    np.testing.assert_allclose(float(blas.dot(a, b)), want, rtol=1e-4)
    np.testing.assert_allclose(float(blas.dot_pallas(a, b, interpret=True)),
                               want, rtol=1e-4)


def test_axpy(rng):
    x = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
    want = np.asarray(y) + 2.5 * np.asarray(x)
    np.testing.assert_allclose(np.asarray(blas.axpy(2.5, x, y)), want,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(blas.axpy_pallas(2.5, x, y, interpret=True)), want,
        rtol=1e-5, atol=1e-6)


def test_copy_reduce(rng):
    x = jnp.asarray(rng.standard_normal(33))
    np.testing.assert_array_equal(np.asarray(blas.copy(x)), np.asarray(x))
    np.testing.assert_allclose(float(blas.reduce_sum(x)),
                               float(np.sum(np.asarray(x))), rtol=1e-5, atol=1e-6)
