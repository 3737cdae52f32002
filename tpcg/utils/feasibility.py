"""Resource feasibility checks for the fused solve.

The reference's only capacity validation is ``checkPcgOccupancy``
(/root/reference/include/pcg.cuh:23-49): it rejects knot_points beyond the
GPU's co-resident-block capacity — and its call site is commented out
(interface.cuh:112), so nothing actually guards the launch. The reference
also under-sizes its shared memory by ``2*state_size`` elements in some
configs (pcg.cuh:15-19 vs the pointer layout at :83-96; SURVEY.md §5.2).

The TPU fused kernel has no co-residency constraint (Pallas grid steps are
sequential), but it does keep the whole working set in VMEM. This module
sizes that working set explicitly — the structural fix for the reference's
smem-undercount class of bug — and is CALLED (not commented out) by the
Pallas backend to fail fast with a clear message.
"""

from __future__ import annotations

import functools
import warnings

import jax.numpy as jnp

# --- per-generation calibration table (VERDICT r2 item 8) ---------------
# Every constant below is a MEASUREMENT, not a spec: the kernel factors in
# fused_vmem_bytes/packed_vmem_bytes were calibrated against Mosaic's
# actual scoped-VMEM accounting on a v5e (provenance in those docstrings),
# and the 16 MiB budget is the v5e scoped limit the same OOM reports
# quote. Other generations inherit the v5e row (16 MiB is the
# conservative floor across current TPU generations) until someone runs
# the calibration sweep there — the TODO markers are the work items. The
# reference has the same class of portability hazard in its co-residency
# occupancy ceiling (pcg.cuh:43-46), which silently depends on the GPU
# model; here the device kind is looked up explicitly and unknown chips
# warn once instead of mis-sizing silently.
_CHIP_TABLE = {
    # device_kind substring -> params
    "v5 lite": dict(vmem_bytes=16 * 1024 * 1024, calibrated=True),
    "v5e": dict(vmem_bytes=16 * 1024 * 1024, calibrated=True),
    # TODO(calibration): measure factors + scoped budget on these.
    "v4": dict(vmem_bytes=16 * 1024 * 1024, calibrated=False),
    "v5p": dict(vmem_bytes=16 * 1024 * 1024, calibrated=False),
    "v6": dict(vmem_bytes=16 * 1024 * 1024, calibrated=False),
}
_V5E = _CHIP_TABLE["v5e"]


def chip_params() -> dict:
    """Resolve the calibration row for the ambient accelerator. CPU (tests,
    interpret mode) and unknown TPU kinds use the v5e row — unknown kinds
    warn once so a new generation is calibrated instead of silently
    mis-sized.

    ``TPCG_VMEM_BYTES`` (env) overrides the scoped-VMEM budget without a
    source edit — the deployment knob for a generation whose Mosaic limit
    differs from the v5e's 16 MiB (run the calibration sweep documented in
    :func:`fused_vmem_bytes`, export the measured budget, file the row).
    The env var is re-read on every call (it is cheap), so setting or
    changing it mid-process takes effect immediately; only the device-kind
    lookup is cached. Parsing (and the malformed-value warning) is memoized
    per distinct string, so a bad value warns once, not on every call."""
    import os

    env = os.environ.get("TPCG_VMEM_BYTES")
    if env:
        v = _parse_vmem_env(env)
        if v is not None:
            return dict(vmem_bytes=v, calibrated=True)
    return _device_row()


@functools.lru_cache(maxsize=8)
def _parse_vmem_env(env: str):
    """int(env) if it is a positive integer, else None (warning once per
    distinct malformed value — the lru_cache is the once-latch)."""
    try:
        v = int(env)
    except ValueError:
        warnings.warn(f"ignoring non-integer TPCG_VMEM_BYTES={env!r}",
                      stacklevel=3)
        return None
    if v <= 0:
        warnings.warn(f"ignoring non-positive TPCG_VMEM_BYTES={env!r}",
                      stacklevel=3)
        return None
    return v


@functools.lru_cache(maxsize=1)
def _device_row() -> dict:
    import jax

    try:
        dev = jax.devices()[0]
        kind = getattr(dev, "device_kind", "") or ""
    except Exception:
        return _V5E
    if dev.platform != "tpu":
        return _V5E  # interpret/CPU runs: sizing is only advisory there
    low = kind.lower()
    for key, row in _CHIP_TABLE.items():
        if key in low:
            if not row["calibrated"]:
                warnings.warn(
                    f"tpcg VMEM calibration has no measured row for "
                    f"{kind!r}; using v5e-measured factors "
                    f"(tpcg/utils/feasibility.py _CHIP_TABLE TODO)",
                    stacklevel=2)
            return row
    warnings.warn(
        f"unknown TPU device_kind {kind!r}; using v5e-measured VMEM "
        f"calibration (tpcg/utils/feasibility.py _CHIP_TABLE)",
        stacklevel=2)
    return _V5E


# Usable VMEM per TPU core (v5e: 16 MiB scoped limit). Module-level
# constant retained for callers/tests; chip_params() is the keyed source.
VMEM_BYTES = _V5E["vmem_bytes"]
VMEM_HEADROOM = 15 / 16


def _budget() -> int:
    return int(chip_params()["vmem_bytes"] * VMEM_HEADROOM)


def fused_vmem_bytes(state_size: int, knot_points: int, dtype=jnp.float32,
                     identity_pinv: bool = False,
                     precond: str = None, rhs: int = 1,
                     method: str = "classic", lean: bool = False,
                     pinv_pages: int = 3) -> int:
    """Estimated VMEM working set of the fused kernel: matrices in
    lane-major layout plus ~10 (n, K) vector pages (gamma/lam0 inputs, lam
    output, r/p/r_tilde/upsilon/shift temporaries in the while carry), state
    axis padded to the f32 sublane tile (8), lanes to 128.

    Matrix-term factors are calibrated against Mosaic's actual scoped-vmem
    accounting on hardware (n=14, all with no placeholder-Pinv operand).

    Fast variant (``lean=False``: S/Pinv loaded as whole values once,
    unrolled Gauss-Jordan — lowest latency):
      * identity:          1.91 x S measured (K=3072 needs 17.74 MiB)
      * explicit Pinv:     3.93 x S measured (K=2048 needs 22.97 MiB)
      * block_jacobi:      2.70 x S measured (K=2048 needs 16.16 MiB)
      * symmetric_stair:   4.22 x S measured (K=2048 needs 24.52 MiB)

    Lean variant (``lean=True``: matrix pages sliced off the refs at use,
    fori_loop Gauss-Jordan — ~1.4x S smaller peak, slower per iteration;
    the backend picks it automatically when fast would overflow):
      * identity:          1.44 x S measured (K=4096 needs 18.46 MiB)
      * explicit Pinv:     2.13 x S measured (K=3072 needs 19.06 MiB)
      * in-kernel build:   2.83 x S measured (K=2048 needs ~16.9 MiB)

    Factors are the exact measured slopes; the safety margin is the
    1/16 VMEM_HEADROOM reserve (double-padding rejected configs the chip
    demonstrably compiles, e.g. lean symmetric_stair at K=1792).
    """
    n, K = state_size, knot_points
    itemsize = jnp.dtype(dtype).itemsize
    n_pad = -(-n // 8) * 8
    K_pad = -(-K // 128) * 128
    S_bytes = 3 * n * n_pad * K_pad * itemsize
    if lean:
        if precond in ("block_jacobi", "symmetric_stair"):
            factor = 2.83
        elif identity_pinv or precond == "identity":
            factor = 1.44
        else:
            factor = 2.13
    else:
        if precond == "symmetric_stair":
            factor = 4.22
        elif precond == "block_jacobi":
            factor = 2.70
        elif identity_pinv or precond == "identity":
            factor = 1.91
        else:
            factor = 3.93
    mat_bytes = factor * S_bytes
    # a BANDED explicit Pinv (stair_refined: 2*band+1 > 3 pages) scales the
    # Pinv-attributable share of the measured factor (explicit minus
    # identity) by pages/3
    if pinv_pages != 3 and not identity_pinv and precond in (None, "explicit"):
        base = 1.44 if lean else 1.91
        mat_bytes += (factor - base) * S_bytes * (pinv_pages - 3) / 3
    # classic carry: lam/r/p + gamma/lam0/out + rt/ups/shift temps ~ 10
    # pages; pipelined/fixed_pipelined carry x/r/u/w/z/q/s/p + m/nn ~ 14
    pages = 14 if "pipelined" in method else 10
    vec_bytes = pages * rhs * n_pad * K_pad * itemsize
    return int(mat_bytes) + vec_bytes


def packed_vmem_bytes(state_size: int, pack_lanes: int, dtype=jnp.float32,
                      identity_pinv: bool = False, precond: str = None,
                      method: str = "classic", lean: bool = False,
                      pinv_pages: int = 3) -> int:
    """VMEM model for the lane-packed batched kernel (tpcg/ops/packed.py):
    the fused model at K -> P*K, plus the grid pipeline's buffering
    overhead — the next grid step's S (and Pinv, and the vector blocks)
    are DMA'd into VMEM while the current pack solves, a charge the
    gridless single-system kernel never pays.

    The per-matrix-operand charge is 1.75 x S, CALIBRATED on chip rather
    than derived: in-kernel symmetric_stair at n=14, PK=1024 fast/
    pipelined measured 16.37 MiB scoped (Mosaic OOM report) vs 11.8 MiB
    from the fused model alone — the pipeline costs ~1.66 x S beyond one
    resident window, not the naive 1.0 x. With this charge the model
    rejects that config (17.5 MiB > 15 budget) and accepts PK=512 fast
    (8.8 MiB) and PK=1024 lean (13.7 MiB), both of which compile and run
    on chip."""
    n, pk = state_size, pack_lanes
    itemsize = jnp.dtype(dtype).itemsize
    n_pad = -(-n // 8) * 8
    pk_pad = -(-pk // 128) * 128
    S_bytes = 3 * n * n_pad * pk_pad * itemsize
    explicit = (precond in (None, "explicit")) and not identity_pinv
    bufs = int(1.75 * S_bytes) + 3 * n_pad * pk_pad * itemsize
    if explicit:  # second matrix operand window, scaled by its page count
        bufs += int(1.75 * S_bytes * pinv_pages / 3)
    return fused_vmem_bytes(state_size, pk, dtype, identity_pinv, precond,
                            1, method, lean, pinv_pages) + bufs


def pick_fused_variant(state_size: int, knot_points: int, dtype=jnp.float32,
                       identity_pinv: bool = False, precond: str = None,
                       rhs: int = 1, method: str = "classic",
                       pinv_pages: int = 3) -> bool:
    """Returns the ``lean`` flag for the fused kernel: False (fast) when the
    fast variant's working set fits VMEM, True when only the lean one does.
    Raises ValueError (via :func:`check_fused_fits`) when neither fits."""
    budget = _budget()
    if fused_vmem_bytes(state_size, knot_points, dtype, identity_pinv,
                        precond, rhs, method, lean=False,
                        pinv_pages=pinv_pages) <= budget:
        return False
    check_fused_fits(state_size, knot_points, dtype, identity_pinv,
                     precond, rhs, method, lean=True,
                     pinv_pages=pinv_pages)
    return True


def check_fused_fits(state_size: int, knot_points: int, dtype=jnp.float32,
                     identity_pinv: bool = False,
                     precond: str = None, rhs: int = 1,
                     method: str = "classic", lean: bool = True,
                     pinv_pages: int = 3) -> None:
    """Raise ValueError (with the max feasible knot_points) if the fused
    kernel's working set exceeds VMEM even in its leanest variant."""
    need = fused_vmem_bytes(state_size, knot_points, dtype, identity_pinv,
                            precond, rhs, method, lean, pinv_pages)
    budget = _budget()
    if need > budget:
        # binary-search the max K that fits
        lo, hi = 1, knot_points
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if fused_vmem_bytes(state_size, mid, dtype,
                                identity_pinv, precond, rhs,
                                method, lean, pinv_pages) <= budget:
                lo = mid
            else:
                hi = mid - 1
        raise ValueError(
            f"fused PCG kernel working set ({need/2**20:.1f} MiB) exceeds "
            f"the VMEM budget ({budget/2**20:.1f} MiB) for state_size="
            f"{state_size}, knot_points={knot_points}. Max feasible "
            f"knot_points at this state_size is ~{lo}; shard the knot axis "
            f"(tpcg.parallel.knot_sharded) or use backend='jnp'.")
