"""Block-banded matrix algebra — the substrate for MATERIALIZED strengthened
preconditioners (tpcg.precond.stair_refined).

Why this exists (round-3 headline work): the measured route to fewer PCG
iterations is a stronger preconditioner, but applying one *recursively*
in-loop (PCGConfig.precond_refine — Neumann steps of 2 bdmv + 2 stair
applies each) tripled per-iteration cost on chip and lost (docs/ROADMAP.md
item 2). The fix is to MATERIALIZE the refined operator once, at build
time, into block-BANDED form: the polynomial ``sum_i (I - M S)^i M`` of
block-tridiagonal ``M`` and ``S`` is exactly a block-banded matrix, so the
in-loop apply collapses to ONE banded SpMV — the same O(1)-sync VPU shape
as the ``bdmv`` the solver already runs (tpcg/ops/bdmv.py), just with
``2*band+1`` instead of 3 block diagonals.

Layout: ``pages (..., K, D, n, n)`` with ``D = 2*band + 1`` odd; page ``d``
holds the dense block ``A[k, k + d - band]``. ``band=1`` is bit-identical
to the cbtd layout of :class:`tpcg.types.BlockTridiag` (reference layout
contract: /root/reference/include/interface.cuh:41, pcg.cuh:108 — this
module is its natural width generalization). Out-of-chain slots
(``k + d - band`` outside ``[0, K)``) are zero, generalizing the cbtd
zero-pad contract.

Everything here is BUILD-time XLA (batched small matmuls the MXU eats);
the one in-kernel consumer is :func:`banded_mv_lane_major`, the width-D
generalization of ``bdmv_lane_major`` used by the fused solve kernel for
explicit banded preconditioners.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Direct elimination / preconditioner assembly needs true f32 — TPU f32
# matmuls otherwise default to bf16-grade MXU passes (CLAUDE.md).
_PREC = jax.lax.Precision.HIGHEST


def band_of(pages) -> int:
    """Half-bandwidth b of a ``(..., K, 2b+1, n, n)`` page stack."""
    D = pages.shape[-3]
    if D % 2 != 1:
        raise ValueError(f"page count must be odd, got {D}")
    return (D - 1) // 2


def shift_k(a, s: int, axis: int):
    """``y[k] = a[k + s]`` along ``axis``, zeros shifted in at the ends."""
    if s == 0:
        return a
    K = a.shape[axis]
    if abs(s) >= K:
        return jnp.zeros_like(a)
    idx_keep = [slice(None)] * a.ndim
    idx_zero = [slice(None)] * a.ndim
    if s > 0:
        idx_keep[axis] = slice(s, None)
        idx_zero[axis] = slice(0, s)
        return jnp.concatenate(
            [a[tuple(idx_keep)], jnp.zeros_like(a[tuple(idx_zero)])],
            axis=axis)
    idx_keep[axis] = slice(None, s)
    idx_zero[axis] = slice(s, None)
    return jnp.concatenate(
        [jnp.zeros_like(a[tuple(idx_zero)]), a[tuple(idx_keep)]], axis=axis)


def zero_invalid(pages):
    """Zero the slots whose block-column index falls outside the chain —
    the banded generalization of the cbtd zero-pad contract
    (types.BlockTridiag: blocks[0,0] and blocks[-1,2] must be zero)."""
    K, D = pages.shape[-4], pages.shape[-3]
    b = (D - 1) // 2
    # int32 iotas: jnp.arange under jax_enable_x64 traces i64, which the
    # TPU compile path rejects (CLAUDE.md x64 notes)
    k = jax.lax.broadcasted_iota(jnp.int32, (K, D), 0)
    d = jax.lax.broadcasted_iota(jnp.int32, (K, D), 1) - jnp.int32(b)
    valid = jnp.logical_and(k + d >= 0, k + d < K)
    return pages * valid[..., None, None].astype(pages.dtype)


def banded_mv(pages, x):
    """``y = A @ x`` for banded ``pages (..., K, D, n, n)``, ``x (..., K, n)``.

    The width-D generalization of :func:`tpcg.ops.bdmv.bdmv`; D=3 computes
    the same quantity (summation order differs: offsets ascend here)."""
    b = band_of(pages)
    y = jnp.zeros_like(x)
    for d in range(pages.shape[-3]):
        xs = shift_k(x, d - b, axis=-2)
        y = y + jnp.einsum('...knm,...km->...kn', pages[..., :, d, :, :], xs,
                           precision=_PREC)
    return y


def banded_mm(A, B, out_band: int = None):
    """``C = A @ B`` in banded form.

    ``A (..., K, 2a+1, n, n)``, ``B (..., K, 2b+1, n, n)`` ->
    ``C (..., K, 2(a+b)+1, n, n)`` (or truncated to ``out_band``):

        C[k, k+d] = sum_e A[k, k+e] @ B[k+e, k+d]

    so page ``d`` of C sums ``A`` page ``e`` times ``B`` page ``d - e``
    row-shifted by ``e``. Pure batched small matmuls — XLA/MXU build-time
    work, never in-kernel."""
    ba, bb = band_of(A), band_of(B)
    bc = ba + bb if out_band is None else min(out_band, ba + bb)
    pages = []
    for d in range(-bc, bc + 1):
        acc = None
        for e in range(-ba, ba + 1):
            f = d - e
            if abs(f) > bb:
                continue
            Bp = shift_k(B[..., :, f + bb, :, :], e, axis=-3)
            t = jnp.einsum('...kij,...kjm->...kim', A[..., :, e + ba, :, :],
                           Bp, precision=_PREC)
            acc = t if acc is None else acc + t
        pages.append(acc)
    return zero_invalid(jnp.stack(pages, axis=-3))


def banded_transpose(A):
    """``A^T`` in banded form: page ``d`` of the result at row ``k`` is
    ``A[k + d - b, -d + b]^T``."""
    b = band_of(A)
    pages = [
        jnp.swapaxes(shift_k(A[..., :, b - d, :, :], d, axis=-3), -1, -2)
        for d in range(-b, b + 1)
    ]
    return zero_invalid(jnp.stack(pages, axis=-3))


def banded_add(A, B, alpha=1.0, beta=1.0):
    """``alpha A + beta B``, widening the narrower operand with zero pages."""
    ba, bb = band_of(A), band_of(B)
    b = max(ba, bb)
    A = pad_band(A, b)
    B = pad_band(B, b)
    return A * jnp.asarray(alpha, A.dtype) + B * jnp.asarray(beta, B.dtype)


def pad_band(A, new_band: int):
    """Widen to ``new_band`` with zero pages (no-op if already that wide)."""
    b = band_of(A)
    if new_band < b:
        raise ValueError(f"pad_band: {new_band} < current band {b}")
    if new_band == b:
        return A
    pad = new_band - b
    z = jnp.zeros_like(A[..., :, :1, :, :])
    zs = jnp.broadcast_to(z, (*A.shape[:-3], pad, *A.shape[-2:]))
    return jnp.concatenate([zs, A, zs], axis=-3)


def truncate_band(A, new_band: int):
    """Drop pages beyond ``new_band`` (no-op if already that narrow).
    Band truncation of a symmetric matrix stays symmetric."""
    b = band_of(A)
    if new_band >= b:
        return A
    cut = b - new_band
    return A[..., :, cut:-cut, :, :]


def symmetrize(A):
    """``(A + A^T) / 2`` — restores the exact symmetry band truncation of
    *intermediate* products can perturb (tpcg.precond.stair_refined)."""
    return banded_add(A, banded_transpose(A), 0.5, 0.5)


def banded_to_dense(pages):
    """Densify to ``(K*n, K*n)`` (test/debug utility, like
    layout.cbtd_to_dense)."""
    K, D, n, _ = pages.shape[-4:]
    b = (D - 1) // 2
    out = jnp.zeros((*pages.shape[:-4], K * n, K * n), pages.dtype)
    for k in range(K):
        for d in range(D):
            j = k + d - b
            if 0 <= j < K:
                out = out.at[..., k * n:(k + 1) * n, j * n:(j + 1) * n].set(
                    pages[..., k, d, :, :])
    return out


# ---------------------------------------------------------------------------
# Lane-major BUILD pipeline — the layout tpcg.precond.stair_refined runs in
# ---------------------------------------------------------------------------
# In the standard page layout (..., K, D, n, n) the minor-most axis is the
# n=14-wide block column: every XLA op runs 14/128-full lanes, and the
# einsum products lower as padded batched MXU matmuls. Transposing ONCE to
# (D, n, n, B, K) puts the knot chain (x batch) on the trailing axes, so
# every product is an m-length outer-product-accumulation chain of full
# (n, n, B, K) VPU FMAs (tpcg.ops.lanelin.matmul_lane) and shifts are
# slices on the trailing axis. Same arithmetic, same zero-slot contract.

def to_lane_major_pages(pages):
    """``(..., K, D, n, n) -> (pages_lm (D, n, n, B, K), lead_shape)``."""
    K, D, n = pages.shape[-4], pages.shape[-3], pages.shape[-1]
    lead = pages.shape[:-4]
    flat = pages.reshape((-1, K, D, n, n))
    return jnp.transpose(flat, (2, 3, 4, 0, 1)), lead


def from_lane_major_pages(P_lm, lead):
    """Inverse of :func:`to_lane_major_pages`."""
    out = jnp.transpose(P_lm, (3, 4, 0, 1, 2))      # (B, K, D, n, n)
    return out.reshape(lead + out.shape[1:])


def _zero_invalid_lm(P_lm):
    K, D = P_lm.shape[-1], P_lm.shape[0]
    b = (D - 1) // 2
    k = jax.lax.broadcasted_iota(jnp.int32, (D, K), 1)
    d = jax.lax.broadcasted_iota(jnp.int32, (D, K), 0) - jnp.int32(b)
    valid = jnp.logical_and(k + d >= 0, k + d < K)
    return P_lm * valid[:, None, None, None, :].astype(P_lm.dtype)


def banded_mm_lm(A, B, out_band: int = None):
    """Lane-major :func:`banded_mm`: ``A (2a+1, n, n, Bt, K)`` @
    ``B (2b+1, n, n, Bt, K)``."""
    from tpcg.ops.lanelin import matmul_lane

    ba = (A.shape[0] - 1) // 2
    bb = (B.shape[0] - 1) // 2
    bc = ba + bb if out_band is None else min(out_band, ba + bb)
    pages = []
    for d in range(-bc, bc + 1):
        acc = None
        for e in range(-ba, ba + 1):
            f = d - e
            if abs(f) > bb:
                continue
            Bp = shift_k(B[f + bb], e, axis=-1)
            t = matmul_lane(A[e + ba], Bp)
            acc = t if acc is None else acc + t
        pages.append(acc)
    return _zero_invalid_lm(jnp.stack(pages))


def banded_transpose_lm(A):
    b = (A.shape[0] - 1) // 2
    pages = [
        jnp.swapaxes(shift_k(A[b - d], d, axis=-1), 0, 1)
        for d in range(-b, b + 1)
    ]
    return _zero_invalid_lm(jnp.stack(pages))


def _pad_band_lm(A, new_band: int):
    b = (A.shape[0] - 1) // 2
    if new_band == b:
        return A
    z = jnp.zeros_like(A[:1])
    zs = jnp.broadcast_to(z, (new_band - b,) + A.shape[1:])
    return jnp.concatenate([zs, A, zs], axis=0)


def banded_add_lm(A, B, alpha=1.0, beta=1.0):
    b = max((A.shape[0] - 1) // 2, (B.shape[0] - 1) // 2)
    A = _pad_band_lm(A, b)
    B = _pad_band_lm(B, b)
    return A * jnp.asarray(alpha, A.dtype) + B * jnp.asarray(beta, B.dtype)


def truncate_band_lm(A, new_band: int):
    b = (A.shape[0] - 1) // 2
    if new_band >= b:
        return A
    cut = b - new_band
    return A[cut:-cut]


def symmetrize_lm(A):
    return banded_add_lm(A, banded_transpose_lm(A), 0.5, 0.5)


# ---------------------------------------------------------------------------
# In-kernel apply (lane-major) — the one runtime consumer
# ---------------------------------------------------------------------------

def _lane_shift(x, n, K, s: int):
    """Lane-major ``y[:, k] = x[:, k + s]``, zeros at the chain ends — the
    distance-``s`` generalization of ``_lane_shift_down``/``_lane_shift_up``
    (tpcg/ops/bdmv.py)."""
    if s == 0:
        return x
    if abs(s) >= K:
        return jnp.zeros_like(x)
    shifted = jnp.roll(x, -s, axis=1)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (n, K), 1)
    if s > 0:
        return jnp.where(k_ids >= K - s, jnp.zeros_like(shifted), shifted)
    return jnp.where(k_ids < -s, jnp.zeros_like(shifted), shifted)


def banded_mv_lane_major(P_lm, v, n, K):
    """Lane-major banded SpMV used INSIDE Pallas kernels: ``P_lm
    (D, n_col, n_row, K)`` (tpcg.ops.bdmv.to_lane_major of banded pages),
    ``v (n, K)``. The width-D generalization of ``bdmv_lane_major`` — same
    sublane-broadcast FMA form, D instead of 3 diagonal pages. ``P_lm`` may
    be a loaded value or a VMEM ref (the lean kernel variant passes the ref
    so only one page is live at a time)."""
    D = P_lm.shape[0]
    b = (D - 1) // 2
    acc = jnp.zeros((n, K), v.dtype)
    for d in range(D):
        xs = _lane_shift(v, n, K, d - b)
        acc = acc + jnp.sum(P_lm[d] * xs[:, None, :], axis=0)
    return acc
