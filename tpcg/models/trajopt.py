"""Synthetic trajectory-optimization KKT / Schur-complement system builders.

The reference solves ``Phi^-1 S lambda = Phi^-1 gamma`` where S is the Schur
complement of an MPC KKT system (README.md:2-11); its downstream consumer
(MPCGPU) benchmarks at iiwa14 scale (stateSize=14, knotPoints up to 512) and
quadrotor scale (stateSize=12). The reference repo itself ships no problem
generators beyond the hardcoded 2x3 example. These builders produce
structurally-faithful synthetic systems — S_k = C_k Q_k^-1 C_k^T structure
from linearized dynamics x_{k+1} = A_k x_k + B_k u_k — for tests and
benchmarks at those published scales (BASELINE.md configs 3-5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpcg.layout import zero_pad_slots
from tpcg.types import BlockTridiag


def mpc_schur_system(key, state_size: int, knot_points: int,
                     control_size: int = None, dtype=jnp.float32,
                     dt: float = 0.05):
    """Build (S, gamma) with the exact block-tridiagonal structure of the
    Schur complement of an LQR-style KKT system. Assembled at full matmul
    precision so the generated benchmark instances are identical across
    platforms (TPU einsums otherwise run bf16-grade).

    With cost Hessians Q_k (SPD) and dynamics Jacobians A_k, the Schur
    complement onto the dynamics multipliers has
      diag_k  = A_{k-1} Q_{k-1}^-1 A_{k-1}^T + Q_k^-1   (+ B R^-1 B^T terms)
      offd_k  = -A_k Q_k^-1  (coupling neighboring knots)
    which is SPD block-tridiagonal — the system family the solver targets.
    """
    with jax.default_matmul_precision("highest"):
        return _mpc_schur_impl(key, state_size, knot_points, control_size,
                               dtype, dt)


def _mpc_schur_impl(key, state_size, knot_points, control_size, dtype, dt):
    n, K = state_size, knot_points
    m = control_size if control_size is not None else max(1, n // 2)
    kA, kB, kQ, kg = jax.random.split(key, 4)

    # stable-ish discretized dynamics: A = I + dt * N(0, 1/sqrt(n))
    A = (jnp.eye(n) + dt * jax.random.normal(kA, (K, n, n)) /
         jnp.sqrt(float(n)))
    B = dt * jax.random.normal(kB, (K, n, m)) / jnp.sqrt(float(m))
    # SPD cost inverses Q^-1 = L L^T + 0.1 I
    Lq = jax.random.normal(kQ, (K, n, n)) * 0.3
    Qinv = jnp.einsum('kij,kmj->kim', Lq, Lq) + 0.1 * jnp.eye(n)
    Rinv_BBt = jnp.einsum('kij,kmj->kim', B, B)  # B R^-1 B^T with R = I

    theta = Qinv + Rinv_BBt                      # per-knot local term
    diag = theta + jnp.concatenate(
        [Qinv[:1] * 0,
         jnp.einsum('kij,kjm,klm->kil', A[:-1], Qinv[:-1], A[:-1])], axis=0)
    diag = diag + 0.05 * jnp.eye(n)              # multiplier regularization
    sub = -jnp.einsum('kij,kjm->kim', A[:-1], Qinv[:-1])  # S_{k+1,k}
    left = jnp.zeros((K, n, n)).at[1:].set(sub)
    right = jnp.zeros((K, n, n)).at[:-1].set(jnp.swapaxes(sub, -1, -2))
    blocks = zero_pad_slots(jnp.stack([left, diag, right], axis=1))

    gamma = jax.random.normal(kg, (K, n))
    return (BlockTridiag(blocks.astype(dtype)), gamma.astype(dtype))


def iiwa14_scale(key=None, knot_points: int = 128, dtype=jnp.float32):
    """stateSize=14 system at the MPCGPU-paper scale (BASELINE.md config 4)."""
    key = key if key is not None else jax.random.PRNGKey(14)
    return mpc_schur_system(key, 14, knot_points, control_size=7,
                            dtype=dtype)


def quadrotor_scale(key=None, knot_points: int = 64, dtype=jnp.float32):
    """stateSize=12 quadrotor MPC scale (BASELINE.md config 3)."""
    key = key if key is not None else jax.random.PRNGKey(12)
    return mpc_schur_system(key, 12, knot_points, control_size=4,
                            dtype=dtype)


def batch_systems(key, batch: int, state_size: int, knot_points: int,
                  dtype=jnp.float32):
    """B independent systems for the batched/fleet paths (BASELINE.md
    config 5)."""
    keys = jax.random.split(key, batch)
    build = jax.vmap(lambda k: _raw(k, state_size, knot_points, dtype))
    blocks, gamma = build(keys)
    return BlockTridiag(blocks), gamma


def _raw(key, n, K, dtype):
    bt, gamma = mpc_schur_system(key, n, K, dtype=dtype)
    return bt.blocks, gamma
