"""Public solver API.

TPU-native replacement for the reference's three ``solvePCG`` overloads
(/root/reference/include/interface.cuh:9-144):

* :func:`pcg_solve` — the general entry point. Plays the role of both the
  dense convenience overload (interface.cuh:25-89) and the device-pointer
  expert overload (interface.cuh:93-144): under jit, inputs are already
  device-resident and stay resident, so the two collapse into one function.
* :func:`solve_reference_flat` — signature-parity shim accepting the
  reference's flat column-major-block layout
  (``solvePCG(h_S, h_gamma, h_lambda, stateSize, knotPoints, config)``).
* :class:`PCGSolver` — the MPC expert path (SURVEY.md §3.3): pre-lowers the
  jitted solve for fixed shapes so per-step latency excludes tracing, and
  keeps problem data device-resident across receding-horizon steps.
* :func:`pcg_solve_batched` — N independent systems at once (parallel MPC),
  the capability the reference lacks (SURVEY.md §2, BASELINE.md config 5).
* :func:`pcg_solve_multirhs` — one system, R right-hand sides jointly.
  (Implicit differentiation lives in tpcg/solver/implicit_diff.py; the
  multi-chip entry points in tpcg/parallel/.)

The CSR entry point the reference stubbed out with ``exit(12)``
(interface.cuh:9-20) is served by ``tpcg.layout.from_csr`` + these functions.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from tpcg import precond
from tpcg.types import BlockTridiag, PCGConfig, PCGResult, check_system
from tpcg.solver import jnp_backend

BACKENDS = ("auto", "jnp", "pallas")


def _as_bt(S) -> BlockTridiag:
    from tpcg.types import BlockBanded

    if isinstance(S, (BlockTridiag, BlockBanded)):
        # pass banded containers through untouched: jnp.asarray on the
        # NamedTuple would stack its single field into a bogus leading
        # dim, breaking the prebuilt stair_refined fixed-S workflow
        return S
    arr = jnp.asarray(S)
    if arr.ndim >= 4 and arr.shape[-3] > 3 and arr.shape[-3] % 2 == 1:
        return BlockBanded(arr)  # raw banded pages (D = 2*band+1 > 3)
    return BlockTridiag(arr)


def _jnp_solver(method: str):
    """The jnp-backend solve fn for a PCGConfig.method."""
    if method == "block":
        raise ValueError("method='block' shares one Krylov space across "
                         "right-hand sides and is only meaningful through "
                         "pcg_solve_multirhs")
    if method == "pipelined":
        from tpcg.solver.pipelined import pcg_pipelined_jnp
        return pcg_pipelined_jnp
    if method == "fixed_pipelined":
        from tpcg.solver.pipelined import pcg_fixed_pipelined_jnp
        return pcg_fixed_pipelined_jnp
    if method == "speculative":
        from tpcg.solver.pipelined import pcg_speculative_jnp
        return pcg_speculative_jnp
    if method == "fixed":
        return jnp_backend.pcg_fixed_jnp
    return jnp_backend.pcg_jnp


def _check_fixed_guard(config: PCGConfig) -> None:
    """The fixed-budget mode runs exactly ``max_iter`` passes with no
    per-iteration tests at all (that IS its latency contract), so a
    divergence guard cannot act mid-solve; reject the combination instead
    of silently ignoring the flag (a nonfinite solve still reports
    ``converged=False`` from the post-hoc |eta| < tol verification)."""
    if config.method in ("fixed", "fixed_pipelined") \
            and config.stop_on_nonfinite:
        raise ValueError(
            f"method={config.method!r} has no per-iteration tests by "
            "design, so stop_on_nonfinite cannot act; drop the flag "
            "(divergence still surfaces as converged=False / nonfinite "
            "eta in the result)")


def _pick_backend(backend: str, dtype) -> str:
    if backend not in BACKENDS:
        raise ValueError(f"backend must be one of {BACKENDS}, got {backend!r}")
    if backend != "auto":
        return backend
    # The fused Pallas path is f32-native and TPU-only; f64 (XLA-emulated
    # on TPU) and non-TPU platforms use the jnp backend.
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and dtype == jnp.float32:
        return "pallas"
    return "jnp"


def pcg_solve(S, gamma, lam0=None, *,
              config: Optional[PCGConfig] = None,
              Pinv: Optional[Union[BlockTridiag, jax.Array]] = None,
              backend: str = "auto") -> PCGResult:
    """Solve ``Phi^-1 S lam = Phi^-1 gamma`` for one system.

    Args:
      S: ``BlockTridiag`` or blocks array ``(K, 3, n, n)``.
      gamma: right-hand side ``(K, n)``.
      lam0: warm-start initial guess ``(K, n)`` (the reference's in/out
        ``h_lambda``, README.md:50); zeros if omitted.
      config: ``PCGConfig`` (defaults mirror constants.cuh:14-19).
      Pinv: optional prebuilt preconditioner (expert path). If given,
        overrides ``config.preconditioner``.
      backend: ``"auto"`` | ``"jnp"`` | ``"pallas"``.
    """
    S = _as_bt(S)
    gamma = jnp.asarray(gamma)
    if lam0 is None:
        lam0 = jnp.zeros_like(gamma)
    else:
        lam0 = jnp.asarray(lam0)
    config = config or PCGConfig()
    if config.method == "block":
        raise ValueError("method='block' is multi-RHS only; use "
                         "pcg_solve_multirhs")
    _check_fixed_guard(config)
    check_system(S, gamma, lam0)
    if Pinv is not None:
        Pinv = _as_bt(Pinv)

    backend = _pick_backend(backend, S.dtype)
    identity = config.preconditioner == "identity" and Pinv is None

    if config.accumulate == "compensated":
        # f32 storage + double-float in-kernel accumulation — the fused
        # kernel's fp64-grade mode (tpcg/ops/compensated.py). Pallas-only
        # (off-TPU it runs in interpret mode); for a true-f64 solve pass
        # float64 inputs, which route to the jnp/XLA backend.
        if config.method != "classic":
            raise ValueError("accumulate='compensated' implements the "
                             "classic method (the parity loop); got "
                             f"method={config.method!r}")
        if config.stop_on_nonfinite or config.precond_refine:
            raise ValueError("accumulate='compensated' has no "
                             "stop_on_nonfinite/precond_refine plumbing")
        if S.dtype != jnp.float32:
            raise ValueError("accumulate='compensated' is f32-storage by "
                             f"definition (got {S.dtype}); float64 inputs "
                             "already solve in full f64 on the jnp "
                             "backend")
        from tpcg.solver import pallas_backend
        in_kernel = (Pinv is None and
                     config.preconditioner in ("block_jacobi",
                                               "symmetric_stair"))
        pinv_blocks = None
        if not identity and not in_kernel:
            pinv_blocks = precond.materialize(S, config, Pinv).blocks
        return pallas_backend.pcg_pallas_compensated(
            S.blocks, pinv_blocks, gamma, lam0,
            exit_tol=config.exit_tol, max_iter=config.max_iter,
            precond=config.preconditioner if in_kernel else None,
            interpret=jax.default_backend() != "tpu")

    # The Pallas backend constructs block-Jacobi / symmetric-stair Phi^-1
    # INSIDE the solve kernel — no separate build region, no Pinv in HBM.
    in_kernel = (backend == "pallas" and Pinv is None and
                 config.preconditioner in ("block_jacobi",
                                           "symmetric_stair"))
    if not identity and not in_kernel:
        Pinv = precond.materialize(S, config, Pinv)
    # stair_refined CONSUMES precond_refine at build time (materialized
    # refinement depth); the apply is one banded SpMV per iteration
    refine = (0 if config.preconditioner == "stair_refined"
              else config.precond_refine)

    spec_kw = ({"spec_budget": config.spec_budget}
               if config.method == "speculative" else {})
    if config.method == "pipelined":
        spec_kw["replace_every"] = config.replace_every
    if backend == "jnp":
        pblocks = S.blocks if identity else Pinv.blocks
        return _jnp_solver(config.method)(
            S.blocks, pblocks, gamma, lam0,
            exit_tol=config.exit_tol, max_iter=config.max_iter,
            identity_pinv=identity,
            stop_on_nonfinite=config.stop_on_nonfinite,
            precond_refine=refine, **spec_kw)
    else:
        from tpcg.solver import pallas_backend
        pinv_blocks = None if (identity or in_kernel) else Pinv.blocks
        return pallas_backend.pcg_pallas(
            S.blocks, pinv_blocks, gamma, lam0,
            exit_tol=config.exit_tol, max_iter=config.max_iter,
            precond=config.preconditioner if in_kernel else None,
            stop_on_nonfinite=config.stop_on_nonfinite,
            method=config.method, precond_refine=refine, **spec_kw)


def pcg_solve_batched(S, gamma, lam0=None, *,
                      config: Optional[PCGConfig] = None,
                      Pinv=None, backend: str = "auto") -> PCGResult:
    """Solve ``B`` independent systems (parallel MPC; BASELINE.md config 5).

    ``S`` blocks ``(B, K, 3, n, n)``, vectors ``(B, K, n)``. Per-system
    iteration counts / convergence flags come back with a leading ``B`` axis.
    """
    S = _as_bt(S)
    gamma = jnp.asarray(gamma)
    if lam0 is None:
        lam0 = jnp.zeros_like(gamma)
    config = config or PCGConfig()
    if config.method == "block":
        raise ValueError("method='block' is multi-RHS only (shared S); use "
                         "pcg_solve_multirhs")
    _check_fixed_guard(config)
    if config.accumulate != "f32":
        raise ValueError("accumulate='compensated' is single-system "
                         "(pcg_solve) only")
    if config.method == "speculative":
        raise ValueError("method='speculative' is single-system "
                         "(pcg_solve) only for now; fleets get the same "
                         "latency contract from method='fixed_pipelined'")
    if S.blocks.ndim != 5:
        raise ValueError(f"batched S.blocks must be (B, K, 3, n, n), got "
                         f"{S.blocks.shape}")
    check_system(S, gamma, lam0)
    if Pinv is not None:
        Pinv = _as_bt(Pinv)

    auto = backend == "auto"
    backend = _pick_backend(backend, S.dtype)
    if auto and backend == "pallas":
        # Measured routing (TPU v5e, n=14, tol 1e-6, build-honest chained
        # timer — the chain perturbs S, so per-solve preconditioner
        # construction is INCLUDED): when the preconditioner is built per
        # solve (Pinv=None, block_jacobi/symmetric_stair), the lane-packed
        # fused kernel wins at EVERY shape — its build runs in-kernel on
        # the VPU while the jnp route pays an XLA-level batched build.
        # Data (B=256): K=32 packed 4.8 vs jnp 13.6 us/sys; K=64 10.0 vs
        # 31.6; K=128 14.1 vs 77.9. (An earlier crossover sending wide
        # short fleets to jnp was calibrated with a gamma-only nudge that
        # let XLA hoist the build out of the chain.) With a PREBUILT
        # Pinv there is no build to amortize and the vmapped XLA solver
        # still wins wide-short fleets (K=32: 2.0 solve-only vs packed
        # 3.3). Explicit backend= overrides this.
        B, K = gamma.shape[0], gamma.shape[1]
        prebuilt = (Pinv is not None
                    or config.preconditioner in ("identity", "explicit"))
        if prebuilt and B >= 32 and K <= 64:
            backend = "jnp"
    identity = config.preconditioner == "identity" and Pinv is None
    in_kernel = (backend == "pallas" and Pinv is None and
                 config.preconditioner in ("block_jacobi",
                                           "symmetric_stair"))
    if not identity and not in_kernel:
        Pinv = precond.materialize(S, config, Pinv)

    if backend == "pallas":
        from tpcg.solver import pallas_backend
        pinv_blocks = None if (identity or in_kernel) else Pinv.blocks
        return pallas_backend.pcg_pallas_batched(
            S.blocks, pinv_blocks, gamma, lam0,
            exit_tol=config.exit_tol, max_iter=config.max_iter,
            precond=config.preconditioner if in_kernel else None,
            stop_on_nonfinite=config.stop_on_nonfinite,
            method=config.method)

    pblocks = S.blocks if identity else Pinv.blocks
    solve1 = lambda s, p, g, l: _jnp_solver(config.method)(
        s, p, g, l, exit_tol=config.exit_tol, max_iter=config.max_iter,
        identity_pinv=identity,
        stop_on_nonfinite=config.stop_on_nonfinite)
    return jax.vmap(solve1)(S.blocks, pblocks, gamma, lam0)


def pcg_solve_multirhs(S, gamma, lam0=None, *,
                       config: Optional[PCGConfig] = None,
                       backend: str = "auto") -> PCGResult:
    """Solve one system against R right-hand sides jointly (shared S).

    ``gamma``/``lam0``: ``(R, K, n)``. On TPU this runs the multi-RHS fused
    kernel (tpcg/ops/multirhs.py — all R solves share each iteration's
    sweep); elsewhere it vmaps the jnp backend over the rhs axis. Returns
    per-rhs results with a leading R axis.

    ``config.method="block"`` selects block-PCG (tpcg/solver/blockcg.py):
    one shared Krylov space with an R-dimensional subspace minimization per
    pass — fewer iterations when the right-hand sides are correlated
    (sensitivity propagation, multi-target MPC). It runs on the XLA
    backend on any platform (its R x R Gram solves are MXU work, not a
    VPU-kernel shape)."""
    S = _as_bt(S)
    gamma = jnp.asarray(gamma)
    lam0 = jnp.zeros_like(gamma) if lam0 is None else jnp.asarray(lam0)
    config = config or PCGConfig()
    if gamma.ndim != 3:
        raise ValueError(f"multi-rhs gamma must be (R, K, n), got "
                         f"{gamma.shape}")
    if config.preconditioner == "explicit":
        # No Pinv parameter exists on this entry point, so 'explicit' could
        # only ever end in precond.materialize demanding one.
        raise ValueError(
            "pcg_solve_multirhs does not accept a prebuilt Pinv; use "
            "preconditioner='identity'/'block_jacobi'/'symmetric_stair', "
            "or pcg_solve per right-hand side for the explicit-Pinv path")
    if S.blocks.ndim != 4:
        raise ValueError(f"multi-rhs S.blocks must be (K, 3, n, n), got "
                         f"{S.blocks.shape}")
    check_system(S, gamma[0], lam0[0])
    if lam0.shape != gamma.shape:
        raise ValueError(f"lam0 shape {lam0.shape} != gamma {gamma.shape}")

    if config.method == "speculative":
        raise ValueError("pcg_solve_multirhs supports classic/pipelined/"
                         "fixed/fixed_pipelined/block; the speculative "
                         "mode is single-system (pcg_solve) only")
    _check_fixed_guard(config)
    if config.accumulate != "f32":
        raise ValueError("accumulate='compensated' is single-system "
                         "(pcg_solve) only")
    if config.method == "block":
        if config.stop_on_nonfinite:
            raise ValueError("method='block' has no stop_on_nonfinite "
                             "plumbing; use classic/pipelined or drop the "
                             "flag")
        from tpcg.solver.blockcg import pcg_block_jnp
        identity = config.preconditioner == "identity"
        pblocks = (S.blocks if identity
                   else precond.materialize(S, config).blocks)
        return pcg_block_jnp(S.blocks, pblocks, gamma, lam0,
                             exit_tol=config.exit_tol,
                             max_iter=config.max_iter,
                             identity_pinv=identity)

    explicit_pallas = backend == "pallas"
    backend = _pick_backend(backend, S.dtype)
    if backend == "pallas" and config.stop_on_nonfinite:
        if explicit_pallas:
            raise ValueError(
                "the multi-RHS fused kernel supports classic/pipelined with "
                "no stop_on_nonfinite; adjust the config or use "
                "backend='jnp'/'auto' (which falls back to the vmapped jnp "
                "solver)")
        backend = "jnp"
    if backend == "pallas":
        from tpcg.ops.multirhs import pcg_pallas_multirhs
        return pcg_pallas_multirhs(S.blocks, gamma, lam0,
                                   exit_tol=config.exit_tol,
                                   max_iter=config.max_iter,
                                   precond=config.preconditioner,
                                   method=config.method)

    identity = config.preconditioner == "identity"
    pblocks = (S.blocks if identity
               else precond.materialize(S, config).blocks)
    solve1 = lambda g, l: _jnp_solver(config.method)(
        S.blocks, pblocks, g, l, exit_tol=config.exit_tol,
        max_iter=config.max_iter, identity_pinv=identity,
        stop_on_nonfinite=config.stop_on_nonfinite)
    return jax.vmap(solve1)(gamma, lam0)


def solve_reference_flat(h_S, h_gamma, h_lambda, state_size: int,
                         knot_points: int,
                         config: Optional[PCGConfig] = None,
                         backend: str = "auto"):
    """Signature-parity shim for the reference's dense convenience overload
    ``solvePCG(h_S, h_gamma, h_lambda, stateSize, knotPoints, config)``
    (interface.cuh:25-89) — flat column-major-block S in, solution and true
    iteration count out (the reference returns 1 instead; SURVEY.md §3.1).

    Returns ``(lam_flat, result)`` where ``lam_flat`` is the flat
    length-``K*n`` solution like the reference's in/out ``h_lambda``.
    """
    from tpcg import layout

    S = layout.from_reference_flat(jnp.asarray(h_S), state_size, knot_points)
    gamma = jnp.asarray(h_gamma, S.dtype).reshape(knot_points, state_size)
    lam0 = jnp.asarray(h_lambda, S.dtype).reshape(knot_points, state_size)
    res = pcg_solve(S, gamma, lam0, config=config, backend=backend)
    return np.asarray(res.lam).reshape(-1), res


class PCGSolver:
    """Shape-specialized, device-resident solver for MPC loops
    (the expert path of SURVEY.md §3.3).

    Jit shape specialization replaces the reference's compile-time
    ``STATE_SIZE``/``KNOT_POINTS`` macro double-declaration
    (constants.cuh:5-11, README.md:63-64): constructing a ``PCGSolver`` for a
    shape plays the role of compiling the kernel template instantiation, and
    :meth:`solve` is the zero-overhead relaunch.
    """

    def __init__(self, state_size: int, knot_points: int,
                 config: Optional[PCGConfig] = None,
                 dtype=jnp.float32, backend: str = "auto",
                 batch: Optional[int] = None):
        self.state_size = int(state_size)
        self.knot_points = int(knot_points)
        self.config = config or PCGConfig()
        self.dtype = jnp.dtype(dtype)
        self.backend = _pick_backend(backend, self.dtype)
        self.batch = batch

        cfg = self.config
        if batch is None:
            fn = lambda blocks, gamma, lam0: pcg_solve(
                BlockTridiag(blocks), gamma, lam0, config=cfg,
                backend=self.backend)
        else:
            fn = lambda blocks, gamma, lam0: pcg_solve_batched(
                BlockTridiag(blocks), gamma, lam0, config=cfg,
                backend=self.backend)
        self._fn = jax.jit(fn)

    def compile(self):
        """Ahead-of-time compile for this solver's shapes (optional; first
        :meth:`solve` call otherwise pays it)."""
        b = () if self.batch is None else (self.batch,)
        shapes = (
            jax.ShapeDtypeStruct(
                (*b, self.knot_points, 3, self.state_size, self.state_size),
                self.dtype),
            jax.ShapeDtypeStruct((*b, self.knot_points, self.state_size),
                                 self.dtype),
            jax.ShapeDtypeStruct((*b, self.knot_points, self.state_size),
                                 self.dtype),
        )
        self._fn = self._fn.lower(*shapes).compile()
        return self

    def solve(self, S, gamma, lam0=None) -> PCGResult:
        S = _as_bt(S)
        gamma = jnp.asarray(gamma)
        if lam0 is None:
            lam0 = jnp.zeros_like(gamma)
        return self._fn(S.blocks, gamma, jnp.asarray(lam0))
