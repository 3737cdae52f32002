"""LQR KKT -> Schur-complement assembly: the layer ABOVE the reference.

The reference solves ``Phi^-1 S lambda = Phi^-1 gamma`` but contains no code
to FORM S and gamma — its downstream consumer (MPCGPU, README.md:66-77)
assembles them from the KKT system of a linear-quadratic trajectory
optimization. This module supplies that layer TPU-natively (batched einsums
over the knot axis), so tpcg covers the full path: problem data -> Schur
complement -> multipliers -> primal trajectory.

Problem (horizon of K knots: states x_0..x_{K-1} of dim n, controls
u_0..u_{K-2} of dim m):

  min  sum_k 1/2 x_k' Q_k x_k + q_k' x_k  +  sum_k 1/2 u_k' R_k u_k + r_k' u_k
  s.t. x_0 = x_init ;  x_{k+1} = A_k x_k + B_k u_k + c_k

Eliminating (x, u) from the KKT system leaves the SPD block-tridiagonal
Schur complement ``S lam = gamma`` on the K dynamics multipliers
(lam_0 for the initial condition):

  diag_0  = Q_0^-1
  diag_k  = Q_k^-1 + A_{k-1} Q_{k-1}^-1 A_{k-1}' + B_{k-1} R_{k-1}^-1 B_{k-1}'
  left_k  = -A_{k-1} Q_{k-1}^-1          (right_k = left_{k+1}' by symmetry)
  gamma_0 = -(x_init + Q_0^-1 q_0)
  gamma_k = -(c_{k-1} + Q_k^-1 q_k - A_{k-1} Q_{k-1}^-1 q_{k-1}
              - B_{k-1} R_{k-1}^-1 r_{k-1})

with primal recovery  x_k = Q_k^-1 (A_k' lam_{k+1} - lam_k - q_k)
(A_{K-1} term absent at k=K-1) and u_k = R_k^-1 (B_k' lam_{k+1} - r_k).

Verified against a dense assembly + solve of the full KKT system
(tests/test_lqr_kkt.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpcg.layout import zero_pad_slots
from tpcg.types import BlockTridiag


class LQRProblem(NamedTuple):
    """Problem data. Shapes: Q (K, n, n), q (K, n), R (K-1, m, m),
    r (K-1, m), A (K-1, n, n), B (K-1, n, m), c (K-1, n), x_init (n,)."""
    Q: jax.Array
    q: jax.Array
    R: jax.Array
    r: jax.Array
    A: jax.Array
    B: jax.Array
    c: jax.Array
    x_init: jax.Array

    @property
    def knot_points(self) -> int:
        return self.Q.shape[0]

    @property
    def state_size(self) -> int:
        return self.Q.shape[-1]

    @property
    def control_size(self) -> int:
        return self.R.shape[-1]


def schur_system(p: LQRProblem):
    """Form (S: BlockTridiag, gamma) from LQR problem data — all batched
    small-matrix ops that XLA vectorizes over the knot axis. Assembled at
    full f32 matmul precision (TPU einsums otherwise run bf16-grade, which
    would perturb the PROBLEM, not just the solve)."""
    with jax.default_matmul_precision("highest"):
        return _schur_system_impl(p)


def _schur_system_impl(p: LQRProblem):
    from tpcg.ops.lanelin import spd_inverse

    K, n = p.knot_points, p.state_size
    Qinv = spd_inverse(p.Q)                       # (K, n, n)  SPD costs
    Rinv = spd_inverse(p.R)                       # (K-1, m, m)

    AQinv = jnp.einsum('kij,kjm->kim', p.A, Qinv[:-1])       # A_{k} Q_k^-1
    AQA = jnp.einsum('kij,kmj->kim', AQinv, p.A)             # A Q^-1 A'
    BRinv = jnp.einsum('kij,kjm->kim', p.B, Rinv)
    BRB = jnp.einsum('kij,kmj->kim', BRinv, p.B)             # B R^-1 B'

    diag = Qinv.at[1:].add(AQA + BRB)
    left = jnp.zeros((K, n, n), p.Q.dtype).at[1:].set(-AQinv)
    right = jnp.zeros((K, n, n), p.Q.dtype).at[:-1].set(
        -jnp.swapaxes(AQinv, -1, -2))
    S = BlockTridiag(zero_pad_slots(
        jnp.stack([left, diag, right], axis=1)))

    Qinv_q = jnp.einsum('kij,kj->ki', Qinv, p.q)             # (K, n)
    gamma0 = -(p.x_init + Qinv_q[0])
    gamma_rest = -(p.c + Qinv_q[1:]
                   - jnp.einsum('kij,kj->ki', AQinv, p.q[:-1])
                   - jnp.einsum('kij,kj->ki', BRinv, p.r))
    gamma = jnp.concatenate([gamma0[None], gamma_rest], axis=0)
    return S, gamma


def recover_primal(p: LQRProblem, lam):
    """Recover the primal trajectory from the multipliers:
    x (K, n), u (K-1, m)."""
    with jax.default_matmul_precision("highest"):
        return _recover_primal_impl(p, lam)


def _recover_primal_impl(p: LQRProblem, lam):
    from tpcg.ops.lanelin import spd_inverse

    Qinv = spd_inverse(p.Q)
    Rinv = spd_inverse(p.R)
    # A_k' lam_{k+1}, absent for the terminal knot
    At_lam = jnp.einsum('kji,kj->ki', p.A, lam[1:])          # (K-1, n)
    At_lam = jnp.concatenate([At_lam, jnp.zeros_like(lam[:1])], axis=0)
    x = jnp.einsum('kij,kj->ki', Qinv, At_lam - lam - p.q)
    Bt_lam = jnp.einsum('kji,kj->ki', p.B, lam[1:])          # (K-1, m)
    u = jnp.einsum('kij,kj->ki', Rinv, Bt_lam - p.r)
    return x, u


def solve_lqr(p: LQRProblem, config=None, backend: str = "auto"):
    """End-to-end: assemble the Schur complement, run the PCG solve, and
    recover the primal trajectory. Returns ``(x, u, result)``."""
    from tpcg.solver.api import pcg_solve
    from tpcg.types import PCGConfig

    S, gamma = schur_system(p)
    res = pcg_solve(S, gamma, config=config or PCGConfig(
        exit_tol=1e-8, max_iter=200, preconditioner="symmetric_stair"),
        backend=backend)
    x, u = recover_primal(p, res.lam)
    return x, u, res


def random_lqr(key, state_size: int, control_size: int, knot_points: int,
               dtype=jnp.float32) -> LQRProblem:
    """Random well-posed LQR problem (SPD costs, stable-ish dynamics)."""
    n, m, K = state_size, control_size, knot_points
    ks = jax.random.split(key, 8)
    Lq = jax.random.normal(ks[0], (K, n, n)) * 0.3
    Q = jnp.einsum('kij,kmj->kim', Lq, Lq) + jnp.eye(n)
    Lr = jax.random.normal(ks[1], (K - 1, m, m)) * 0.3
    R = jnp.einsum('kij,kmj->kim', Lr, Lr) + jnp.eye(m)
    A = jnp.eye(n) + 0.1 * jax.random.normal(ks[2], (K - 1, n, n)) / n ** 0.5
    B = jax.random.normal(ks[3], (K - 1, n, m)) / m ** 0.5
    q = jax.random.normal(ks[4], (K, n))
    r = jax.random.normal(ks[5], (K - 1, m))
    c = 0.1 * jax.random.normal(ks[6], (K - 1, n))
    x_init = jax.random.normal(ks[7], (n,))
    return LQRProblem(*(z.astype(dtype) for z in
                        (Q, q, R, r, A, B, c, x_init)))
