"""Preconditioner construction and application.

The reference allocates ``d_Pinv`` but contains no construction code — its
downstream consumer (MPCGPU, cited at /root/reference/README.md:66-77) builds
the block-Jacobi / symmetric-stair Phi^-1 itself using the block load/store
helpers the reference exports for that purpose (utils.cuh:87-161; SURVEY.md
§2.7). The reference's own "identity" fallback (``empty_pinv``,
types.cuh:27/33) never reaches the kernel and multiplies by uninitialized
memory (SURVEY.md §3.1). This package supplies real implementations of all
three, as batched XLA ops (one ``jnp.linalg.inv`` over the ``(K, n, n)``
diagonal stack — XLA batches the tiny factorizations across knots).

All preconditioners share the cbtd structure, so *applying* any of them is
the same ``bdmv`` kernel used for S — exactly how the reference applies Phi^-1
(pcg.cuh:133,183 call the same ``bdmv`` as :157).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

import jax
from tpcg.layout import zero_pad_slots
from tpcg.types import BlockTridiag, PCGConfig


def identity(S: BlockTridiag) -> BlockTridiag:
    """Phi^-1 = I in cbtd form."""
    K, n = S.knot_points, S.state_size
    blocks = jnp.zeros((K, 3, n, n), S.dtype)
    blocks = blocks.at[:, 1].set(jnp.eye(n, dtype=S.dtype))
    return BlockTridiag(blocks)


def _inv_diag(S: BlockTridiag):
    """Batched inverse of the K diagonal blocks (full f32 precision — TPU
    matmuls otherwise default to bf16-grade MXU passes)."""
    with jax.default_matmul_precision("highest"):
        return jnp.linalg.inv(S.blocks[..., :, 1, :, :])


def block_jacobi(S: BlockTridiag) -> BlockTridiag:
    """Phi^-1 with diag blocks ``D_k^{-1}``, zero off-diagonals."""
    Dinv = _inv_diag(S)
    blocks = jnp.zeros_like(S.blocks)
    blocks = blocks.at[..., :, 1, :, :].set(Dinv)
    return BlockTridiag(blocks)


def symmetric_stair(S: BlockTridiag) -> BlockTridiag:
    """Symmetric-stair Phi^-1 (the MPCGPU preconditioner; SURVEY.md §2.7).

    Block row k of Phi^-1:
      left  = -D_k^{-1} @ S_{k,k-1} @ D_{k-1}^{-1}
      diag  =  D_k^{-1}
      right = -D_k^{-1} @ S_{k,k+1} @ D_{k+1}^{-1}

    For S symmetric this Phi^-1 is symmetric and captures the tridiagonal
    coupling the block-Jacobi preconditioner ignores, cutting PCG iteration
    counts on trajectory-opt KKT systems.
    """
    Dinv = _inv_diag(S)  # (..., K, n, n)
    L = S.blocks[..., :, 0, :, :]
    R = S.blocks[..., :, 2, :, :]
    prec = jax.lax.Precision.HIGHEST
    Dinv_dn = jnp.concatenate(
        [jnp.zeros_like(Dinv[..., :1, :, :]), Dinv[..., :-1, :, :]], axis=-3)
    Dinv_up = jnp.concatenate(
        [Dinv[..., 1:, :, :], jnp.zeros_like(Dinv[..., :1, :, :])], axis=-3)
    left = -jnp.einsum('...kij,...kjm,...kmn->...kin', Dinv, L, Dinv_dn,
                       precision=prec)
    right = -jnp.einsum('...kij,...kjm,...kmn->...kin', Dinv, R, Dinv_up,
                        precision=prec)
    blocks = jnp.stack([left, Dinv, right], axis=-3)
    return BlockTridiag(zero_pad_slots(blocks))


_BUILDERS = {
    "identity": identity,
    "block_jacobi": block_jacobi,
    "symmetric_stair": symmetric_stair,
}


def build(S: BlockTridiag, kind: str) -> BlockTridiag:
    """Construct the Phi^-1 of the given kind for S."""
    try:
        return _BUILDERS[kind](S)
    except KeyError:
        raise ValueError(f"unknown preconditioner kind {kind!r}; "
                         f"expected one of {sorted(_BUILDERS)}") from None


def materialize(S: BlockTridiag, config: PCGConfig,
                Pinv: Optional[BlockTridiag] = None) -> BlockTridiag:
    """Resolve the Pinv a solve should use: an explicit one if provided,
    otherwise built per ``config.preconditioner``."""
    if Pinv is not None:
        if Pinv.blocks.shape != S.blocks.shape:
            raise ValueError(
                f"Pinv shape {Pinv.blocks.shape} != S shape {S.blocks.shape}")
        return Pinv
    if config.preconditioner == "explicit":
        raise ValueError("config.preconditioner='explicit' requires passing "
                         "Pinv")
    return build(S, config.preconditioner)


def apply(Pinv: BlockTridiag, v):
    """r_tilde = Phi^-1 @ v — same cbtd SpMV as the system matrix."""
    from tpcg.ops.bdmv import bdmv

    return bdmv(Pinv.blocks, v)
