"""Receding-horizon MPC loop demo: warm starting across steps.

The reference's checkpoint/resume analog (SURVEY.md §5.4): ``h_lambda`` is an
in/out argument (interface.cuh:58,76) precisely so a receding-horizon MPC
controller can warm-start each solve from the previous step's multipliers —
the usage pattern of the expert path (SURVEY.md §3.3, data device-resident
across steps). This module packages that pattern functionally: the carried
state is an explicit pytree, and the per-step solve is one jitted call.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpcg.types import BlockTridiag, PCGConfig, PCGResult


class MPCState(NamedTuple):
    """Carried across receding-horizon steps."""
    lam: jax.Array          # warm-start multipliers (K, n)
    step: jax.Array         # int32 step counter
    total_iters: jax.Array  # cumulative PCG iterations (diagnostics)


def init_state(knot_points: int, state_size: int,
               dtype=jnp.float32) -> MPCState:
    return MPCState(lam=jnp.zeros((knot_points, state_size), dtype),
                    step=jnp.zeros((), jnp.int32),
                    total_iters=jnp.zeros((), jnp.int32))


def shift_warm_start(lam):
    """Receding-horizon shift: knot k's multiplier seeds knot k-1 at the next
    MPC step (the horizon slides forward one knot); the new terminal knot
    reuses the previous terminal value."""
    return jnp.concatenate([lam[1:], lam[-1:]], axis=0)


def mpc_step(state: MPCState, S: BlockTridiag, gamma,
             config: Optional[PCGConfig] = None, *, shift: bool = True,
             backend: str = "auto") -> tuple[MPCState, PCGResult]:
    """One receding-horizon step: solve with the carried warm start, then
    advance the state. Jit-friendly (wrap in jax.jit with static config)."""
    from tpcg.solver.api import pcg_solve

    lam0 = shift_warm_start(state.lam) if shift else state.lam
    res = pcg_solve(S, gamma, lam0, config=config, backend=backend)
    new = MPCState(lam=res.lam, step=state.step + 1,
                   total_iters=state.total_iters + res.iters)
    return new, res
