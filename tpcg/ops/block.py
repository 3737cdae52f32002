"""Block access helpers on cbtd arrays.

TPU-native equivalents of the reference's exported block movers
(/root/reference/include/utils.cuh:87-161: ``gato_memcpy``,
``load_block_bd`` with its transpose option, ``store_block_bd`` with its
scalar multiplier) — the utilities downstream consumers (MPCGPU) use to
assemble preconditioners in the 3-block-per-row layout (SURVEY.md §2.7).

On TPU these are functional slice/update ops that XLA fuses; they exist so a
downstream trajectory optimizer porting from the reference finds the same
vocabulary. Unlike the reference's ``store_block_bd``, the multiplier==1
path does not write the block twice (utils.cuh:145-151 does, a quirk not
reproduced), and out-of-range block coordinates raise instead of printf-ing
(utils.cuh:100-103).
"""

from __future__ import annotations

import jax.numpy as jnp

LEFT, DIAG, RIGHT = 0, 1, 2


def _check(blocks, bcol: int, brow: int):
    K = blocks.shape[-4]
    if not 0 <= bcol <= 2:
        raise ValueError(f"bcol must be 0 (left), 1 (diag) or 2 (right); "
                         f"got {bcol}")
    if not 0 <= brow < K:
        raise ValueError(f"brow {brow} out of range for knot_points={K}")


def load_block(blocks, bcol: int, brow: int, transpose: bool = False):
    """Fetch one dense block (utils.cuh:96-130 equivalent).

    ``blocks (..., K, 3, n, n)`` -> ``(..., n, n)``; ``transpose=True``
    returns the block transposed (the option MPCGPU uses to materialize
    ``S_{k,k+1} = S_{k+1,k}^T``)."""
    _check(blocks, bcol, brow)
    blk = blocks[..., brow, bcol, :, :]
    return jnp.swapaxes(blk, -1, -2) if transpose else blk


def store_block(blocks, block, bcol: int, brow: int, multiplier=1):
    """Functionally write one dense block, optionally scaled
    (utils.cuh:132-161 equivalent; returns the updated array)."""
    _check(blocks, bcol, brow)
    if multiplier != 1:
        block = block * multiplier
    return blocks.at[..., brow, bcol, :, :].set(block)


def block_rows(blocks, brow: int):
    """The full ``(3, n, n)`` row of blocks for knot ``brow`` (the unit the
    reference stages into shared memory, pcg.cuh:104-110)."""
    K = blocks.shape[-4]
    if not 0 <= brow < K:
        raise ValueError(f"brow {brow} out of range for knot_points={K}")
    return blocks[..., brow, :, :, :]


def symmetrize(blocks):
    """Enforce the block-tridiagonal symmetry contract
    ``S_{k,k-1} = S_{k-1,k}^T`` by propagating the sub-diagonal (left)
    blocks, symmetrizing the diagonal blocks to ``(D + D^T)/2``, and zeroing
    the pad slots. Useful after assembling only one triangle, the way
    downstream consumers typically build S."""
    diag = blocks[..., :, 1, :, :]
    out = blocks.at[..., :, 1, :, :].set(
        0.5 * (diag + jnp.swapaxes(diag, -1, -2)))
    left = blocks[..., 1:, 0, :, :]
    out = out.at[..., :-1, 2, :, :].set(jnp.swapaxes(left, -1, -2))
    out = out.at[..., 0, 0, :, :].set(0)
    out = out.at[..., -1, 2, :, :].set(0)
    return out
