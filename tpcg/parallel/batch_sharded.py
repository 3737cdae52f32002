"""Batch (fleet) sharding: N independent MPC systems spread over a mesh.

The embarrassingly-parallel axis the reference cannot express at all (one
system per launch, SURVEY.md §2 "Batched multi-system solve: absent"). Each
device runs the fused batched solve on its shard; there is zero cross-device
communication, so this is the DCN-friendly axis for multi-host fleets while
knot sharding (tpcg/parallel/knot_sharded.py) stays on ICI.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpcg.types import BlockTridiag, PCGConfig, PCGResult
from tpcg.solver import jnp_backend


def pcg_solve_batch_sharded(S, gamma, lam0=None, *, mesh: Mesh,
                            axis_name: str = "batch",
                            config: Optional[PCGConfig] = None,
                            backend: str = "jnp",
                            interpret: bool = False) -> PCGResult:
    """Solve ``B`` systems with the batch axis sharded over ``mesh``.

    ``S`` blocks ``(B, K, 3, n, n)``, vectors ``(B, K, n)``; ``B`` must be
    divisible by the mesh axis size. ``backend="pallas"`` runs the fused
    grid-batched kernel per device (the production TPU path);
    ``backend="jnp"`` runs the vmapped oracle (CPU CI / f64).
    """
    from tpcg import precond
    from tpcg.solver.api import _as_bt

    S = _as_bt(S)
    gamma = jnp.asarray(gamma)
    lam0 = jnp.zeros_like(gamma) if lam0 is None else jnp.asarray(lam0)
    config = config or PCGConfig()
    nd = mesh.shape[axis_name]
    B = S.blocks.shape[0]
    if B % nd != 0:
        raise ValueError(f"batch={B} not divisible by mesh axis "
                         f"'{axis_name}' size {nd}")

    identity = config.preconditioner == "identity"
    pinv_blocks = (None if identity
                   else precond.materialize(S, config).blocks)

    def solve_shard(s_loc, p_loc, g_loc, l_loc):
        if backend == "pallas":
            from tpcg.solver import pallas_backend
            return pallas_backend.pcg_pallas_batched(
                s_loc, None if identity else p_loc, g_loc, l_loc,
                exit_tol=config.exit_tol, max_iter=config.max_iter,
                method=config.method,
                stop_on_nonfinite=config.stop_on_nonfinite,
                interpret=interpret)
        from tpcg.solver.api import _jnp_solver
        solve1 = functools.partial(
            _jnp_solver(config.method), exit_tol=config.exit_tol,
            max_iter=config.max_iter, identity_pinv=identity,
            stop_on_nonfinite=config.stop_on_nonfinite)
        return jax.vmap(solve1)(s_loc, p_loc, g_loc, l_loc)

    shard = P(axis_name)
    sharding = NamedSharding(mesh, shard)
    args = [jax.device_put(S.blocks, sharding),
            jax.device_put(S.blocks if pinv_blocks is None else pinv_blocks,
                           sharding),
            jax.device_put(gamma, sharding),
            jax.device_put(lam0, sharding)]
    out = jax.jit(jax.shard_map(
        solve_shard, mesh=mesh,
        in_specs=(shard, shard, shard, shard),
        out_specs=PCGResult(lam=shard, iters=shard, converged=shard,
                            eta=shard),
        check_vma=False,
    ))(*args)
    return out
