"""LQR Schur-complement assembly vs a dense solve of the full KKT system.

The ground truth assembles the complete KKT matrix
[[H, C'], [C, 0]] (H = blkdiag(Q_0, R_0, Q_1, ..., Q_{K-1}), C = dynamics
constraints) in numpy, solves it directly, and compares both the
multipliers and the recovered primal trajectory against the tpcg path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpcg import PCGConfig, pcg_solve
from tpcg.models import lqr_kkt


def _dense_kkt(p):
    """Assemble and solve the full KKT system densely. Variable order:
    z = (x_0, u_0, x_1, u_1, ..., x_{K-1}); multipliers (lam_0..lam_{K-1})."""
    Q = np.asarray(p.Q, np.float64)
    R = np.asarray(p.R, np.float64)
    A = np.asarray(p.A, np.float64)
    B = np.asarray(p.B, np.float64)
    q = np.asarray(p.q, np.float64)
    r = np.asarray(p.r, np.float64)
    c = np.asarray(p.c, np.float64)
    x_init = np.asarray(p.x_init, np.float64)
    K, n = Q.shape[0], Q.shape[-1]
    m = R.shape[-1]

    nz = K * n + (K - 1) * m
    x_off = [k * (n + m) for k in range(K)]
    u_off = [k * (n + m) + n for k in range(K - 1)]

    H = np.zeros((nz, nz))
    h = np.zeros(nz)
    for k in range(K):
        H[x_off[k]:x_off[k] + n, x_off[k]:x_off[k] + n] = Q[k]
        h[x_off[k]:x_off[k] + n] = q[k]
    for k in range(K - 1):
        H[u_off[k]:u_off[k] + m, u_off[k]:u_off[k] + m] = R[k]
        h[u_off[k]:u_off[k] + m] = r[k]

    C = np.zeros((K * n, nz))
    d = np.zeros(K * n)
    C[0:n, x_off[0]:x_off[0] + n] = np.eye(n)
    d[0:n] = x_init
    for k in range(1, K):
        row = slice(k * n, (k + 1) * n)
        C[row, x_off[k]:x_off[k] + n] = np.eye(n)
        C[row, x_off[k - 1]:x_off[k - 1] + n] = -A[k - 1]
        C[row, u_off[k - 1]:u_off[k - 1] + m] = -B[k - 1]
        d[row] = c[k - 1]

    KKT = np.block([[H, C.T], [C, np.zeros((K * n, K * n))]])
    rhs = np.concatenate([-h, d])
    sol = np.linalg.solve(KKT, rhs)
    z, lam = sol[:nz], sol[nz:]
    x = np.stack([z[x_off[k]:x_off[k] + n] for k in range(K)])
    u = np.stack([z[u_off[k]:u_off[k] + m] for k in range(K - 1)])
    return x, u, lam.reshape(K, n)


def test_schur_system_matches_dense_kkt():
    p = lqr_kkt.random_lqr(jax.random.PRNGKey(0), 4, 2, 8,
                           dtype=jnp.float64)
    x_true, u_true, lam_true = _dense_kkt(p)

    S, gamma = lqr_kkt.schur_system(p)
    # S must be SPD and reproduce the dense multipliers
    Ad = np.asarray(S.dense())
    np.testing.assert_allclose(Ad, Ad.T, atol=1e-10)
    assert np.linalg.eigvalsh(Ad).min() > 0
    lam_direct = np.linalg.solve(Ad, np.asarray(gamma).reshape(-1))
    # KKT multiplier sign convention: our lam solves S lam = gamma with
    # lam = -lam_kkt or +lam_kkt depending on constraint sign; check both
    err_pos = np.abs(lam_direct - lam_true.reshape(-1)).max()
    err_neg = np.abs(lam_direct + lam_true.reshape(-1)).max()
    assert min(err_pos, err_neg) < 1e-8, (err_pos, err_neg)


def test_solve_lqr_end_to_end():
    p = lqr_kkt.random_lqr(jax.random.PRNGKey(1), 4, 2, 12,
                           dtype=jnp.float64)
    x_true, u_true, _ = _dense_kkt(p)
    x, u, res = lqr_kkt.solve_lqr(
        p, config=PCGConfig(1e-14, 500, "symmetric_stair"), backend="jnp")
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(u), u_true, rtol=1e-5, atol=1e-7)


def test_primal_satisfies_dynamics():
    p = lqr_kkt.random_lqr(jax.random.PRNGKey(2), 3, 2, 10,
                           dtype=jnp.float64)
    x, u, res = lqr_kkt.solve_lqr(
        p, config=PCGConfig(1e-14, 500, "block_jacobi"), backend="jnp")
    assert bool(res.converged)
    x, u = np.asarray(x), np.asarray(u)
    np.testing.assert_allclose(x[0], np.asarray(p.x_init), atol=1e-6)
    for k in range(p.knot_points - 1):
        np.testing.assert_allclose(
            x[k + 1],
            np.asarray(p.A[k]) @ x[k] + np.asarray(p.B[k]) @ u[k] +
            np.asarray(p.c[k]), atol=1e-6)
