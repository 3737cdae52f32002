"""tpcg — TPU-native preconditioned conjugate gradient for the symmetric
block-tridiagonal systems of trajectory optimization / MPC.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of A2R-Lab/GBD-PCG
(reference at /root/reference; structural analysis in SURVEY.md). The
reference's persistent CUDA cooperative kernel becomes a fused Pallas kernel
with an internal ``lax.while_loop``; its GLASS device-BLAS becomes VPU
lane-shift / reduce ops; its compile-time shape macros become jit shape
specialization; and on top it adds what the reference lacks: real identity
preconditioning, in-library block-Jacobi / symmetric-stair construction,
CSR ingestion, batched multi-system solves, and multi-chip knot-axis sharding.
"""

from tpcg.types import (BlockTridiag, PCGConfig, PCGResult,
                        DEFAULT_EPSILON, DEFAULT_MAX_PCG_ITER)
from tpcg.layout import (from_reference_flat, to_reference_flat,
                         dense_to_cbtd, cbtd_to_dense, from_csr,
                         random_spd_cbtd)
from tpcg.solver.api import (pcg_solve, pcg_solve_batched,
                             pcg_solve_multirhs,
                             solve_reference_flat, PCGSolver)
from tpcg.solver.implicit_diff import pcg_solve_grad
from tpcg.solver.direct import bcr_solve
from tpcg import precond

__version__ = "0.1.0"

__all__ = [
    "BlockTridiag", "PCGConfig", "PCGResult",
    "DEFAULT_EPSILON", "DEFAULT_MAX_PCG_ITER",
    "from_reference_flat", "to_reference_flat", "dense_to_cbtd",
    "cbtd_to_dense", "from_csr", "random_spd_cbtd",
    "pcg_solve", "pcg_solve_batched", "pcg_solve_multirhs",
    "solve_reference_flat", "PCGSolver",
    "pcg_solve_grad", "bcr_solve", "precond",
]
