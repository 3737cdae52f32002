"""Block-tridiagonal matrix-vector product (the reference's ``bdmv`` +
``loadbdVec`` pair, /root/reference/include/utils.cuh:9-85, rebuilt TPU-first).

The reference stages a 3-segment halo window of the vector into shared memory
per thread-block (loadbdVec, utils.cuh:9-40) and runs a column-order dot per
row (bdmv, utils.cuh:46-85). On TPU neither staging nor halo logic is needed
within one core: the product is expressed as three batched block matvecs on
shifted vectors, which XLA/Mosaic fuses into VPU multiply-accumulates.

Two implementations:

* :func:`bdmv` — pure jnp, the correctness oracle (and perfectly good XLA
  code on its own; used by the jnp solver backend).
* :func:`bdmv_pallas` — a fused Pallas kernel in the lane-major layout
  ``(3, n, n, K)`` / ``(n, K)`` that keeps the knot axis on the 128-wide lane
  dimension. This layout is shared with the fused persistent solve kernel
  (tpcg/ops/fused_pcg.py); see that module for the layout rationale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def shift_down(x):
    """x[k] -> x[k-1] slot: returns y with y[k] = x[k-1], y[0] = 0.

    The TPU-native replacement for the left-neighbor halo load
    (utils.cuh:26-30): a concatenation XLA lowers to a lane shift."""
    return jnp.concatenate([jnp.zeros_like(x[..., :1, :]), x[..., :-1, :]],
                           axis=-2)


def shift_up(x):
    """y[k] = x[k+1], y[K-1] = 0 (right-neighbor halo, utils.cuh:21-25)."""
    return jnp.concatenate([x[..., 1:, :], jnp.zeros_like(x[..., :1, :])],
                           axis=-2)


def bdmv(blocks, x):
    """y = S @ x for cbtd ``blocks (..., K, 3, n, n)``, ``x (..., K, n)``.

    Boundary safety: the shifted vectors are zero at the chain ends, so the
    padding slots ``blocks[0,0]`` / ``blocks[-1,2]`` never contribute — the
    same guarantee the reference gets by skipping those loads entirely
    (pcg.cuh:105-106) and summing only 2*b_dim columns at the boundary rows
    (utils.cuh:58-75).

    Block-BANDED operands (D != 3 pages, e.g. a materialized stair_refined
    Phi^-1) dispatch to the width-general :func:`tpcg.ops.banded.banded_mv`.
    """
    if blocks.shape[-3] != 3:
        from tpcg.ops.banded import banded_mv

        return banded_mv(blocks, x)
    left = blocks[..., :, 0, :, :]
    diag = blocks[..., :, 1, :, :]
    right = blocks[..., :, 2, :, :]
    # precision pinned: TPU f32 einsums default to bf16-grade MXU passes,
    # which perturbs iteration counts vs the pure-VPU fused kernel (CLAUDE.md)
    prec = jax.lax.Precision.HIGHEST
    y = jnp.einsum('...knm,...km->...kn', diag, x, precision=prec)
    y = y + jnp.einsum('...knm,...km->...kn', left, shift_down(x),
                       precision=prec)
    y = y + jnp.einsum('...knm,...km->...kn', right, shift_up(x),
                       precision=prec)
    return y


# ---------------------------------------------------------------------------
# Lane-major layout helpers (shared with tpcg/ops/fused_pcg.py)
# ---------------------------------------------------------------------------

def to_lane_major(blocks):
    """Canonical ``(K, 3, n, n)`` -> lane-major ``(3, n_col, n_row, K)``.

    Puts the (large) knot axis on TPU lanes so every VPU op vectorizes over
    knots, with block *columns* as the outer unrolled axis and block rows on
    sublanes: ``lm[d, c, r, k] = blocks[k, d, r, c]``. Each ``lm[d, c]`` is
    then a natural ``(n, K)`` 2D page, and the bdmv contraction becomes
    ``3n`` sublane-broadcast fused multiply-adds with no cross-tile gathers.
    (The reference arrived at the same column-major-within-block layout for
    its thread-per-row striding, utils.cuh:62.)"""
    return jnp.transpose(blocks, (1, 3, 2, 0))


def vec_to_lane_major(x):
    """``(K, n)`` -> ``(n, K)``."""
    return jnp.swapaxes(x, -1, -2)


def _lane_shift_down(x, n, K):
    """Lane-major down-shift: y[:, k] = x[:, k-1], y[:, 0] = 0."""
    if K == 1:  # no neighbors; also jnp.roll on a size-1 axis produces a
        return jnp.zeros_like(x)  # zero-size slice Mosaic rejects
    shifted = jnp.roll(x, 1, axis=1)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (n, K), 1)
    return jnp.where(k_ids == 0, jnp.zeros_like(shifted), shifted)


def _lane_shift_up(x, n, K):
    """Lane-major up-shift: y[:, k] = x[:, k+1], y[:, K-1] = 0."""
    if K == 1:
        return jnp.zeros_like(x)
    shifted = jnp.roll(x, -1, axis=1)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (n, K), 1)
    return jnp.where(k_ids == K - 1, jnp.zeros_like(shifted), shifted)


def bdmv_lane_major(S_lm, x_lm, *, n, K):
    """Lane-major bdmv used *inside* Pallas kernels.

    ``S_lm (3, n_col, n_row, K)``, ``x_lm (n, K)`` -> ``(n, K)``:
    ``y[r, k] = sum_{d,c} S_lm[d, c, r, k] * x_shift_d[c, k]``.

    Per diagonal d: one ``(n_c, n_r, K) * (n_c, 1, K)`` multiply (a sublane
    broadcast of each vector row — the only broadcast form Mosaic relayouts
    support here; the "natural" 4D einsum broadcast is rejected with
    "non-singleton logical dimension is replicated") followed by a sum over
    the unrolled leading column axis. Measured ~6% faster per solve than
    fully unrolling the 3n FMA terms (fewer instruction issues)."""
    xs = (
        _lane_shift_down(x_lm, n, K),
        x_lm,
        _lane_shift_up(x_lm, n, K),
    )
    acc = jnp.zeros((n, K), x_lm.dtype)
    for d in range(3):
        acc = acc + jnp.sum(S_lm[d] * xs[d][:, None, :], axis=0)
    return acc


def _bdmv_kernel(S_ref, x_ref, out_ref, *, n, K):
    out_ref[:, :] = bdmv_lane_major(S_ref[:, :, :, :], x_ref[:, :], n=n, K=K)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bdmv_pallas(blocks, x, interpret: bool = False):
    """Fused Pallas cbtd SpMV: same contract as :func:`bdmv` (single system,
    no batch dims). Converts to lane-major at the edges; inside jit the
    transposes fuse with neighbors."""
    K, n = blocks.shape[-4], blocks.shape[-1]
    S_lm = to_lane_major(blocks)
    x_lm = vec_to_lane_major(x)
    with jax.enable_x64(False):
        y_lm = pl.pallas_call(
            functools.partial(_bdmv_kernel, n=n, K=K),
            out_shape=jax.ShapeDtypeStruct((n, K), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(S_lm, x_lm)
    return jnp.swapaxes(y_lm, -1, -2)
