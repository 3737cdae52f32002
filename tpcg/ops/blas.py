"""Micro-BLAS primitives — the GLASS-submodule replacement.

The reference consumes exactly three functions from its GLASS device-BLAS
submodule (SURVEY.md §2.8): ``glass::copy(n, src, dst)`` (thread-strided
copy, pcg.cuh:111,215), ``glass::dot<T,n>(out, a, b)`` (intra-block dot,
pcg.cuh:144,163,187) and ``glass::reduce(out, n, src)`` (sum of per-block
partials from global scratch, pcg.cuh:147,167,191). On TPU these are single
VPU expressions; inside the fused kernel they appear inline (tpcg/ops/
fused_pcg.py). This module exposes them as standalone ops — both as jnp
functions (usable inside any Pallas kernel body or XLA graph) and as
self-contained Pallas kernels — so downstream consumers porting
GLASS-flavored code find the same vocabulary, and so each primitive is
independently testable against the oracle (SURVEY.md §4). ``axpy`` is
load-bearing: the jnp backend's canonical ``classic_pcg_step`` (shared by
the solver and the diagnostics scan) builds its vector updates from it.

Note what is NOT here: the reference needs ``reduce`` only because each
thread-block posts a partial dot to global scratch and re-reduces after a
grid.sync (a hand-rolled all-reduce). On one TPU core ``dot`` already
returns the full reduction; across cores the equivalent is ``lax.psum``
(tpcg/parallel/knot_sharded.py), not a scratch-buffer protocol.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --- jnp forms (use these inside kernels / jitted code) ---

def copy(src):
    """glass::copy equivalent — functional identity copy."""
    return jnp.asarray(src) + 0


def dot(a, b):
    """glass::dot equivalent — full dot product of same-shape arrays,
    reduced over every axis (scalar out)."""
    return jnp.sum(a * b)


def axpy(alpha, x, y):
    """y + alpha*x (the reference writes these as explicit strided loops,
    pcg.cuh:172-176,203-206)."""
    return y + alpha * x


def reduce_sum(partials):
    """glass::reduce equivalent — sum a vector of partials to a scalar."""
    return jnp.sum(partials)


# --- standalone Pallas kernels (unit-test surface / micro-bench) ---

def _dot_kernel(a_ref, b_ref, out_ref):
    out_ref[0] = jnp.sum(a_ref[:, :] * b_ref[:, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def dot_pallas(a, b, interpret: bool = False):
    """Scalar dot of two 2D arrays via one Pallas kernel (SMEM scalar out)."""
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _dot_kernel,
            out_shape=jax.ShapeDtypeStruct((1,), a.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            interpret=interpret,
        )(a, b)
    return out[0]


def _axpy_kernel(alpha_ref, x_ref, y_ref, out_ref):
    out_ref[:, :] = y_ref[:, :] + alpha_ref[0] * x_ref[:, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def axpy_pallas(alpha, x, y, interpret: bool = False):
    """out = y + alpha*x for 2D arrays, alpha a scalar."""
    alpha = jnp.asarray(alpha, x.dtype).reshape(1)
    with jax.enable_x64(False):
        return pl.pallas_call(
            _axpy_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(alpha, x, y)
