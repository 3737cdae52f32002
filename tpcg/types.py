"""Core data types for tpcg.

TPU-native rebuild of the reference's type layer
(``/root/reference/include/types.cuh:7-35`` and ``constants.cuh:5-20``).

Differences from the reference, by design (SURVEY.md §7 "faithful quirk
policy"):

* ``PCGConfig`` replaces ``pcg_config<T>`` (types.cuh:18-35). The dead
  ``pcg_grid`` / ``pcg_block`` launch-geometry fields (ignored at
  interface.cuh:132) do not exist here — XLA owns scheduling. The
  ``empty_pinv`` int flag becomes a first-class ``preconditioner`` kind.
* The compile-time ``STATE_SIZE`` / ``KNOT_POINTS`` macro double-declaration
  (constants.cuh:5-11, README.md:63-64) is replaced by jit shape
  specialization: shapes are read off the arrays and trigger retrace.
* Results are a structured ``PCGResult`` pytree instead of the reference's
  partially-lost iteration count (interface.cuh:88 returns 1) and the
  never-read ``d_max_iter_exit`` flag (interface.cuh:141).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Defaults mirror /root/reference/include/constants.cuh:14-19.
DEFAULT_MAX_PCG_ITER = 25
DEFAULT_EPSILON = 1e-6

#: Valid preconditioner kinds for :class:`PCGConfig`.
PRECONDITIONER_KINDS = ("identity", "block_jacobi", "symmetric_stair",
                        "stair_refined", "explicit")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PCGConfig:
    """Solver configuration (reference: types.cuh:18-35, constants.cuh:14-19).

    Attributes:
      exit_tol: absolute tolerance on ``|r . Pinv r|`` (pcg.cuh:195 semantics —
        an *absolute* test on the preconditioned residual inner product, not a
        relative 2-norm test).
      max_iter: maximum PCG iterations (constants.cuh:15 default 25).
      preconditioner: one of :data:`PRECONDITIONER_KINDS`. ``"identity"``
        corresponds to the reference's ``empty_pinv=1`` default
        (types.cuh:33) — except here it is actually implemented (the
        reference's identity fallback multiplies by uninitialized device
        memory, SURVEY.md §3.1). ``"explicit"`` means the caller passes a
        prebuilt ``Pinv`` (the expert path of interface.cuh:93-144).
    """

    exit_tol: float = dataclasses.field(
        default=DEFAULT_EPSILON, metadata=dict(static=False)
    )
    max_iter: int = dataclasses.field(default=DEFAULT_MAX_PCG_ITER,
                                      metadata=dict(static=True))
    preconditioner: str = dataclasses.field(default="identity",
                                            metadata=dict(static=True))
    #: Failure detection (SURVEY.md §5.3 — the reference has none): when
    #: True, the loop also exits as soon as eta goes non-finite (divergence /
    #: indefinite system) instead of burning the remaining iterations; the
    #: result reports converged=False with the non-finite eta as evidence.
    stop_on_nonfinite: bool = dataclasses.field(default=False,
                                                metadata=dict(static=True))
    #: "classic" = the reference's exact loop (the parity target);
    #: "pipelined" = Ghysels-Vanroose pipelined PCG — one scalar sync point
    #: per iteration instead of two (tpcg/solver/pipelined.py); a different
    #: method with its own iteration counts, offered for latency.
    #: "fixed" = exactly max_iter passes with NO per-iteration exit test
    #: (zero scalar sync points in the loop — the bounded-latency real-time
    #: MPC mode; ``converged`` reports whether the final eta met exit_tol).
    #: "fixed_pipelined" = the same bounded-latency contract on the
    #: pipelined (one-sync-point) recurrence — the fastest fixed-budget
    #: form on chip (tpcg/solver/pipelined.py fixed_pipelined_body).
    #: "speculative" = a zero-sync fixed sweep of ``spec_budget`` passes
    #: followed by an ADAPTIVE pipelined top-up to exit_tol — the full
    #: adaptive-tolerance contract at near-fixed-mode speed when the
    #: budget guess is right (warm-started MPC knows last step's count).
    #: "block" = block-PCG sharing one Krylov space across right-hand sides
    #: (tpcg/solver/blockcg.py) — multi-RHS entry point only.
    method: str = dataclasses.field(default="classic",
                                    metadata=dict(static=True))
    #: Fixed-sweep pass count for method="speculative" (0 = auto: three
    #: quarters of max_iter). In an MPC loop, set it from the previous
    #: control step's iteration count.
    spec_budget: int = dataclasses.field(default=0,
                                         metadata=dict(static=True))
    #: Residual-replacement cadence for method="pipelined" (single-system
    #: paths; fleets/sharded keep the default). The pipelined recurrences
    #: drift in fp32 and the default (16) periodically recomputes the
    #: auxiliary vectors — but the in-loop cadence guard is a real
    #: per-iteration sync cost and each firing costs ~6 operator applies.
    #: MEASURED (iiwa14 K=128, stair_refined, on chip): replace_every=0
    #: solves in 10.8 µs / 26 iters vs 13.5 µs / 25 with the default —
    #: with a strong preconditioner (few iterations) the drift never
    #: materializes (K=512 also converges in 28 iters without
    #: replacement) and 0 is the right setting; keep the default for
    #: weakly preconditioned or very long solves.
    replace_every: int = dataclasses.field(default=16,
                                           metadata=dict(static=True))
    #: Accumulation precision: "f32" (native) or "compensated" — f32
    #: storage with double-float (~48-bit) in-kernel accumulation of the
    #: residual recurrence and dots (tpcg/ops/compensated.py), serving
    #: the reference's fp64 instantiation (examples/pcg_solve_dp.cu)
    #: without TPU's emulated f64. Classic method, single-system, Pallas
    #: path; for a true-f64 solve use float64 inputs on the jnp backend.
    accumulate: str = dataclasses.field(default="f32",
                                        metadata=dict(static=True))
    #: Neumann refinement of the preconditioner apply:
    #: ``z <- z + Pinv (v - S z)``, ``precond_refine`` times per apply.
    #: Measured at iiwa14 K=128: iterations 34 -> 24/20/17 at 1/2/3 steps.
    #: On ONE core this is a wash (each step adds a full SpMV+apply of
    #: vector work), but on the SHARDED solver iterations cost psum
    #: latency over ICI, so fewer iterations at more local work is the
    #: right trade. 0 = plain apply (the parity default).
    precond_refine: int = dataclasses.field(default=0,
                                            metadata=dict(static=True))

    def __post_init__(self):
        if self.preconditioner not in PRECONDITIONER_KINDS:
            raise ValueError(
                f"preconditioner must be one of {PRECONDITIONER_KINDS}, "
                f"got {self.preconditioner!r}")
        if int(self.max_iter) < 1:
            raise ValueError(f"max_iter must be >= 1, got {self.max_iter}")
        if self.method not in ("classic", "pipelined", "fixed",
                               "fixed_pipelined", "speculative", "block"):
            raise ValueError(f"method must be 'classic', 'pipelined', "
                             f"'fixed', 'fixed_pipelined', 'speculative' "
                             f"or 'block', got {self.method!r}")
        if int(self.spec_budget) < 0 or (
                self.method == "speculative"
                and int(self.spec_budget) >= int(self.max_iter)):
            raise ValueError(
                f"spec_budget must be in [0, max_iter) "
                f"(got {self.spec_budget} with max_iter={self.max_iter})")
        if int(self.precond_refine) < 0:
            raise ValueError(f"precond_refine must be >= 0, "
                             f"got {self.precond_refine}")
        if self.accumulate not in ("f32", "compensated"):
            raise ValueError(f"accumulate must be 'f32' or 'compensated', "
                             f"got {self.accumulate!r}")
        if int(self.replace_every) < 0:
            raise ValueError(f"replace_every must be >= 0, "
                             f"got {self.replace_every}")


class PCGResult(NamedTuple):
    """Structured solve result.

    The reference computes all three of these but loses two: the convenience
    wrapper returns 1 instead of the iteration count (interface.cuh:88) and
    frees ``d_max_iter_exit`` unread (interface.cuh:141). Here they are
    first-class outputs.

    Attributes:
      lam: solution vectors, shape ``(..., knot_points, state_size)``.
      iters: iterations executed, int32. Semantics match pcg.cuh:195,212:
        a solve converging on 0-based loop pass ``i`` reports ``i + 1``;
        hitting ``max_iter`` reports ``max_iter``.
      converged: True iff the tolerance exit fired (the logical negation of
        the reference's ``max_iter_exit`` flag, pcg.cuh:101,195).
      eta: final preconditioned residual inner product ``r . Pinv r``.
    """

    lam: jax.Array
    iters: jax.Array
    converged: jax.Array
    eta: jax.Array


class BlockTridiag(NamedTuple):
    """Compressed block-tridiagonal (cbtd) matrix.

    Layout contract (the TPU-native reshaping of the reference layout
    documented at SURVEY.md §2 / interface.cuh:41 / pcg.cuh:108): for each
    block row ``k`` of ``knot_points`` rows, three dense
    ``state_size x state_size`` blocks ``[left_k, diag_k, right_k]``.

    ``blocks`` has shape ``(knot_points, 3, state_size, state_size)`` with
    **row-major** blocks (standard ``blocks[k, d] @ x`` semantics). The
    reference stores blocks column-major (utils.cuh:62,71,80); conversion
    from that flat layout lives in :mod:`tpcg.layout`.

    ``blocks[0, 0]`` and ``blocks[-1, 2]`` are padding and must be zero
    (matching the reference's zero-padded slots, examples/pcg_solve.cu:14-22).
    All tpcg kernels are robust to nonzero padding there — boundary halo
    vectors are zeroed — but canonical constructors zero them.
    """

    blocks: jax.Array

    @property
    def knot_points(self) -> int:
        return self.blocks.shape[-4]

    @property
    def state_size(self) -> int:
        return self.blocks.shape[-1]

    @property
    def dtype(self):
        return self.blocks.dtype

    def dense(self) -> jax.Array:
        """Densify to ``(K*n, K*n)`` (test/debug utility)."""
        from tpcg import layout  # local import to avoid cycle

        return layout.cbtd_to_dense(self.blocks)


class BlockBanded(NamedTuple):
    """Compressed block-BANDED matrix — the width generalization of
    :class:`BlockTridiag` used by materialized strengthened preconditioners
    (tpcg.precond.stair_refined; tpcg/ops/banded.py).

    ``pages`` has shape ``(..., knot_points, D, n, n)`` with ``D = 2*band+1``
    odd; page ``d`` holds the dense block ``A[k, k + d - band]``. ``band=1``
    is layout-identical to ``BlockTridiag.blocks``. Out-of-chain slots are
    zero (the banded generalization of the reference's zero-padded cbtd
    slots, examples/pcg_solve.cu:14-22).
    """

    pages: jax.Array

    @property
    def blocks(self) -> jax.Array:  # uniform access alongside BlockTridiag
        return self.pages

    @property
    def band(self) -> int:
        return (self.pages.shape[-3] - 1) // 2

    @property
    def knot_points(self) -> int:
        return self.pages.shape[-4]

    @property
    def state_size(self) -> int:
        return self.pages.shape[-1]

    @property
    def dtype(self):
        return self.pages.dtype

    def dense(self) -> jax.Array:
        from tpcg.ops.banded import banded_to_dense

        return banded_to_dense(self.pages)


def check_system(S: BlockTridiag, gamma: jax.Array, lam: jax.Array) -> None:
    """Static shape/dtype validation for a solve call.

    Replaces the reference's absence of validation (its only check,
    ``checkPcgOccupancy`` pcg.cuh:23-49, is commented out at
    interface.cuh:112). Raises ``ValueError`` on mismatch.
    """
    b = S.blocks
    if b.ndim < 4 or b.shape[-3] != 3 or b.shape[-1] != b.shape[-2]:
        raise ValueError(
            f"S.blocks must have shape (..., knot_points, 3, n, n), got {b.shape}")
    K, n = b.shape[-4], b.shape[-1]
    batch = b.shape[:-4]
    want = (*batch, K, n)
    if tuple(gamma.shape) != want:
        raise ValueError(f"gamma shape {gamma.shape} != expected {want}")
    if tuple(lam.shape) != want:
        raise ValueError(f"lambda shape {lam.shape} != expected {want}")
    if gamma.dtype != b.dtype or lam.dtype != b.dtype:
        raise ValueError(
            f"dtype mismatch: S={b.dtype}, gamma={gamma.dtype}, lam={lam.dtype}")
