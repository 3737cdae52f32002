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
    """Batched inverse of the K diagonal blocks — lane-major unrolled
    LDL^T (tpcg/ops/lanelin.py; the diag blocks are sign-definite for any
    definite S — the golden reference system's are NEGATIVE definite).
    The previous ``jnp.linalg.inv`` route cost ~600 µs per (128,14,14)
    stack on v5e (batched tiny LU), dominating every XLA-level build."""
    from tpcg.ops.lanelin import spd_inverse
    return spd_inverse(S.blocks[..., :, 1, :, :])


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
    from tpcg.ops import lanelin

    if S.state_size > lanelin._MAX_UNROLL_N:
        return _symmetric_stair_einsum(S)

    # Lane-major build: knots (and any batch) on the TRAILING axes, every
    # op an elementwise lane FMA — no dot_general (XLA lowers stacks of
    # tiny matmuls as padded MXU batches: measured ~11.6 us/system for
    # this build over a (256,32) fleet the einsum way, ~30x less
    # lane-major). Same trick as tpcg/models/rbd_lane.py.
    blocks = S.blocks
    lead = blocks.shape[:-4]
    K, n = blocks.shape[-4], blocks.shape[-1]
    flat = blocks.reshape((-1, K, 3, n, n))
    Mt = jnp.transpose(flat, (2, 3, 4, 0, 1))       # (3, n, n, B, K)
    L, D, R = Mt[0], Mt[1], Mt[2]
    Dinv = lanelin.spd_inverse_lane(D)              # (n, n, B, K)
    zeros = jnp.zeros_like(Dinv[..., :1])
    Dinv_dn = jnp.concatenate([zeros, Dinv[..., :-1]], axis=-1)
    Dinv_up = jnp.concatenate([Dinv[..., 1:], zeros], axis=-1)
    left = -lanelin.matmul_lane(lanelin.matmul_lane(Dinv, L), Dinv_dn)
    right = -lanelin.matmul_lane(lanelin.matmul_lane(Dinv, R), Dinv_up)
    out = jnp.stack([left, Dinv, right])            # (3, n, n, B, K)
    out = jnp.transpose(out, (3, 4, 0, 1, 2)).reshape(
        lead + (K, 3, n, n))
    return BlockTridiag(zero_pad_slots(out))


def _symmetric_stair_einsum(S: BlockTridiag) -> BlockTridiag:
    """Einsum fallback for n > lanelin._MAX_UNROLL_N (the lane-major
    build's O(n^3) unroll would bloat the trace; at large n the batched
    MXU matmuls are the right tool anyway)."""
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


def stair_refined(S: BlockTridiag, levels: int = 1, band: int = None,
                  sym: bool = True):
    """MATERIALIZED polynomial refinement of the symmetric-stair Phi^-1 —
    the round-3 headline preconditioner (VERDICT round-2 item 1).

    The Neumann-refined apply ``z <- z + M (v - S z)`` (PCGConfig.
    precond_refine) cuts iteration counts hard (measured 35 -> 25/21/18 at
    1/2/3 levels, iiwa14 K=128) but tripled the in-loop apply cost and
    LOST on one chip (docs/ROADMAP.md item 2). The same effective operator,

        P_L = sum_{i=0..L} (I - M S)^i M,      M = symmetric-stair Phi^-1

    is a block-BANDED matrix (exact half-bandwidth ``2L + 1``), so it can
    be built ONCE per solve at XLA level (batched MXU matmuls over the knot
    axis, tpcg/ops/banded.py) and applied in-loop as ONE banded SpMV — the
    same O(1)-sync VPU shape the solver already runs for S itself. Fewer
    iterations at near-unchanged per-iteration cost.

    Args:
      levels: refinement depth L (>= 1). The iteration-count win saturates
        fast; the build cost and the apply bandwidth grow per level.
      band: truncate P to this half-bandwidth (intermediates too). Default
        ``2*levels + 1`` = exact. Truncation trades a slightly weaker
        spectrum for a narrower apply.
      sym: re-symmetrize after truncation (exact P_L is symmetric; band
        truncation of INTERMEDIATE products can perturb that, and CG needs
        a symmetric preconditioner).

    Returns a :class:`tpcg.types.BlockBanded`.
    """
    from tpcg.ops import banded
    from tpcg.types import BlockBanded

    if levels < 1:
        raise ValueError(f"stair_refined needs levels >= 1, got {levels}")
    exact = 2 * levels + 1
    band = exact if band is None else band
    if band < 1:
        raise ValueError(f"band must be >= 1, got {band}")
    M = symmetric_stair(S).blocks          # (..., K, 3, n, n), band 1
    Sp = zero_pad_slots(S.blocks)
    from tpcg.ops.lanelin import _MAX_UNROLL_N
    if S.state_size <= _MAX_UNROLL_N:
        # lane-major pipeline: knots (x batch) trailing, products as
        # outer-product FMA chains — no padded batched MXU matmuls
        # (banded.py "Lane-major BUILD pipeline")
        M_lm, lead = banded.to_lane_major_pages(M)
        S_lm, _ = banded.to_lane_major_pages(Sp)
        P = M_lm
        for _ in range(levels):
            SP = banded.banded_mm_lm(S_lm, P, out_band=band + 1)
            MSP = banded.banded_mm_lm(M_lm, SP, out_band=band)
            P = banded.banded_add_lm(
                banded.banded_add_lm(M_lm, P), MSP, 1.0, -1.0)
            P = banded.truncate_band_lm(P, band)
        if sym and band < exact:
            P = banded.symmetrize_lm(P)
        return BlockBanded(banded.from_lane_major_pages(P, lead))
    P = M
    with jax.default_matmul_precision("highest"):
        for _ in range(levels):
            SP = banded.banded_mm(Sp, P, out_band=band + 1)
            MSP = banded.banded_mm(M, SP, out_band=band)
            P = banded.banded_add(banded.banded_add(M, P), MSP, 1.0, -1.0)
            P = banded.truncate_band(P, band)
        if sym and band < exact:
            P = banded.symmetrize(P)
    return BlockBanded(P)


_BUILDERS = {
    "identity": identity,
    "block_jacobi": block_jacobi,
    "symmetric_stair": symmetric_stair,
}


def build(S: BlockTridiag, kind: str, **kwargs):
    """Construct the Phi^-1 of the given kind for S. ``stair_refined``
    accepts ``levels``/``band``/``sym`` keywords (see
    :func:`stair_refined`); the cbtd kinds take none."""
    if kind == "stair_refined":
        return stair_refined(S, **kwargs)
    try:
        builder = _BUILDERS[kind]
    except KeyError:
        raise ValueError(
            f"unknown preconditioner kind {kind!r}; expected one of "
            f"{sorted([*_BUILDERS, 'stair_refined'])}") from None
    if kwargs:
        raise ValueError(f"{kind!r} takes no builder options, got "
                         f"{sorted(kwargs)}")
    return builder(S)


def materialize(S: BlockTridiag, config: PCGConfig,
                Pinv: Optional[BlockTridiag] = None):
    """Resolve the Pinv a solve should use: an explicit one if provided,
    otherwise built per ``config.preconditioner``. The result's ``.blocks``
    is ``(..., K, D, n, n)`` with D = 3 for the cbtd kinds and D = 2*band+1
    for banded ones (``stair_refined`` / an explicit ``BlockBanded``)."""
    if Pinv is not None:
        pb, sb = Pinv.blocks.shape, S.blocks.shape
        if (pb[:-3] != sb[:-3] or pb[-2:] != sb[-2:]
                or pb[-3] % 2 != 1):
            raise ValueError(
                f"Pinv shape {pb} incompatible with S shape {sb} (expect "
                "same batch/K/n dims and an odd block-diagonal count)")
        return Pinv
    if config.preconditioner == "explicit":
        raise ValueError("config.preconditioner='explicit' requires passing "
                         "Pinv")
    if config.preconditioner == "stair_refined":
        # precond_refine doubles as the materialized refinement depth here
        # (it is CONSUMED by the build — the solve applies P once per
        # iteration, no in-loop refinement; tpcg/solver/api.py zeroes the
        # apply-time refine for this kind)
        return stair_refined(S, levels=max(1, config.precond_refine))
    return build(S, config.preconditioner)


def apply(Pinv: BlockTridiag, v):
    """r_tilde = Phi^-1 @ v — same cbtd SpMV as the system matrix."""
    from tpcg.ops.bdmv import bdmv

    return bdmv(Pinv.blocks, v)
