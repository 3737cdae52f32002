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
    """Lane-major assembly: the knot axis goes to TPU lanes ONCE up front
    and every block product is an outer-product FMA chain over full-width
    ``(.., .., K)`` pages (tpcg/ops/lanelin.py) — no ``dot_general``
    (XLA lowers (K, n, n) stacks of tiny einsums as padded MXU batches,
    the same pathology the rbd_lane linearizer eliminated). The canonical
    ``(K, 3, n, n)`` restore at the end is a pure transpose that XLA
    cancels against the solver's ``to_lane_major`` when both live in one
    jit (the MPC path)."""
    from tpcg.ops.lanelin import (matmul_lane, matmul_lane_nt, matvec_lane,
                                  spd_inverse_lane)

    K, n = p.knot_points, p.state_size
    Qt = jnp.moveaxis(p.Q, 0, -1)                 # (n, n, K)
    Rt = jnp.moveaxis(p.R, 0, -1)                 # (m, m, K-1)
    At = jnp.moveaxis(p.A, 0, -1)                 # (n, n, K-1)
    Bt = jnp.moveaxis(p.B, 0, -1)                 # (n, m, K-1)
    qt = jnp.moveaxis(p.q, 0, -1)                 # (n, K)
    rt = jnp.moveaxis(p.r, 0, -1)                 # (m, K-1)

    Qinv_t = spd_inverse_lane(Qt)                 # (n, n, K)  SPD costs
    Rinv_t = spd_inverse_lane(Rt)                 # (m, m, K-1)

    AQinv = matmul_lane(At, Qinv_t[:, :, :-1])    # A_k Q_k^-1
    AQA = matmul_lane_nt(AQinv, At)               # A Q^-1 A'
    BRinv = matmul_lane(Bt, Rinv_t)               # B R^-1
    BRB = matmul_lane_nt(BRinv, Bt)               # B R^-1 B'

    diag = Qinv_t.at[:, :, 1:].add(AQA + BRB)
    left = jnp.zeros((n, n, K), p.Q.dtype).at[:, :, 1:].set(-AQinv)
    right = jnp.zeros((n, n, K), p.Q.dtype).at[:, :, :-1].set(
        -jnp.swapaxes(AQinv, 0, 1))
    # restore canonical blocks[k, d, r, c] from lane pages page[r, c, k]
    S = BlockTridiag(zero_pad_slots(jnp.moveaxis(
        jnp.stack([left, diag, right], axis=0), -1, 0)))

    Qinv_q = matvec_lane(Qinv_t, qt)              # (n, K)
    gamma0 = -(p.x_init + Qinv_q[:, 0])
    gamma_rest = -(jnp.moveaxis(p.c, 0, -1) + Qinv_q[:, 1:]
                   - matvec_lane(AQinv, qt[:, :-1])
                   - matvec_lane(BRinv, rt))
    gamma = jnp.concatenate([gamma0[:, None], gamma_rest], axis=1)
    return S, jnp.moveaxis(gamma, 0, -1)                     # (K, n)


def recover_primal(p: LQRProblem, lam):
    """Recover the primal trajectory from the multipliers:
    x (K, n), u (K-1, m)."""
    with jax.default_matmul_precision("highest"):
        return _recover_primal_impl(p, lam)


def _recover_primal_impl(p: LQRProblem, lam):
    """Lane-major (knot axis on lanes) like the assembly above: the small
    solves are unrolled LDL^T lane chains, the mat-vecs broadcast FMAs."""
    from tpcg.ops.lanelin import chol_solve_lane, matvec_lane

    Qt = jnp.moveaxis(p.Q, 0, -1)                 # (n, n, K)
    Rt = jnp.moveaxis(p.R, 0, -1)                 # (m, m, K-1)
    lam_t = jnp.moveaxis(lam, 0, -1)              # (n, K)
    # A_k' lam_{k+1}, absent for the terminal knot: out[i] = sum_j A[j,i] l[j]
    At = jnp.moveaxis(p.A, 0, -1)                 # (n, n, K-1)
    At_lam = matvec_lane(jnp.swapaxes(At, 0, 1), lam_t[:, 1:])
    At_lam = jnp.concatenate([At_lam, jnp.zeros_like(lam_t[:, :1])], axis=1)
    x = chol_solve_lane(Qt, At_lam - lam_t - jnp.moveaxis(p.q, 0, -1))
    Bt = jnp.moveaxis(p.B, 0, -1)                 # (n, m, K-1)
    Bt_lam = matvec_lane(jnp.swapaxes(Bt, 0, 1), lam_t[:, 1:])
    u = chol_solve_lane(Rt, Bt_lam - jnp.moveaxis(p.r, 0, -1))
    return jnp.moveaxis(x, 0, -1), jnp.moveaxis(u, 0, -1)


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
