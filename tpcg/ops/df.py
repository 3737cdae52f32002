"""Double-float (two-float compensated) arithmetic on the VPU.

The fp64 story (VERDICT r2 item 4 / SURVEY.md §7 "fp32-with-fp64-
accumulation option"): TPU f64 is software-emulated and the f64 solve path
falls back to XLA (measured 423 µs on the 3-knot golden system vs ~13 µs
for the f32 kernel). A double-float representation — an unevaluated sum
``hi + lo`` of two f32 with ``|lo| <= ulp(hi)/2`` — carries ~48 bits of
significand through plain f32 VPU ops, which is enough to push the PCG
residual floor from the f32 ~1e-7 regime to ~1e-12 tolerances in-kernel.

All primitives are elementwise over arbitrary-shaped f32 arrays (they
vectorize over the (n, K) lane-major pages the fused kernel uses) and use
only add/sub/mul — TPU Pallas exposes no fused-multiply-add primitive, so
``two_prod`` uses the Dekker split (constant 4097 = 2^12 + 1 for f32).

References (public domain algorithms): Dekker 1971 (exact addition /
multiplication), Knuth TAOCP v2 (two_sum), Shewchuk 1997 (robust
predicates), Hida-Li-Bailey QD library notes. The implementation below is
written from the standard recurrences, not from any library's code.

CAUTION: these identities hold only if the compiler neither re-associates
floating-point arithmetic nor contracts mul+add into FMA. **Mosaic/TPU
preserves them** — measured on chip: the compensated solve reaches 5.6e-14
relative solution error at tol 1e-24 (vs the f32 kernel's 3.9e-7 floor).
**XLA:CPU does NOT**: under jit it contracts ``a*b + c`` into FMA (LLVM
codegen level — even ``lax.optimization_barrier`` between the mul and the
add does not stop it), which breaks ``two_sum``'s assumption that its
input is the *rounded* product and silently degrades the compensation to
a few-x improvement over plain f32 (measured: broadcast-operand graphs
trigger it; same values as materialized full arrays do not). CPU tests
therefore assert modest accuracy gains only; the fp64-grade claims are
asserted on hardware (tests/test_tpu_hardware.py).
"""

from __future__ import annotations

import jax.numpy as jnp

_SPLIT = 4097.0  # 2^12 + 1 for f32 (24-bit significand)


def two_sum(a, b):
    """Exact addition: returns (s, e) with s = fl(a+b), s + e == a + b."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """two_sum assuming |a| >= |b| (3 ops instead of 6)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Dekker split: a == hi + lo with hi holding the top 12 bits."""
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Exact multiplication: (p, e) with p = fl(a*b), p + e == a * b."""
    p = a * b
    a_hi, a_lo = split(a)
    b_hi, b_lo = split(b)
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


# --- double-float values: a pair (hi, lo) ------------------------------

def df(hi, lo=None):
    return (hi, jnp.zeros_like(hi) if lo is None else lo)


def df_add(x, y):
    """DF + DF (Knuth two_sum based; ~51-bit accurate)."""
    s, e = two_sum(x[0], y[0])
    e = e + x[1] + y[1]
    return quick_two_sum(s, e)


def df_add_f(x, b):
    """DF + f32."""
    s, e = two_sum(x[0], b)
    e = e + x[1]
    return quick_two_sum(s, e)


def df_neg(x):
    return (-x[0], -x[1])


def df_sub(x, y):
    return df_add(x, df_neg(y))


def df_mul_f(x, b):
    """DF * f32."""
    p, e = two_prod(x[0], b)
    e = e + x[1] * b
    return quick_two_sum(p, e)


def df_mul(x, y):
    """DF * DF."""
    p, e = two_prod(x[0], y[0])
    e = e + x[0] * y[1] + x[1] * y[0]
    return quick_two_sum(p, e)


def df_div(x, y):
    """DF / DF via one correction step (accurate to ~2 ulps of DF)."""
    q1 = x[0] / y[0]
    r = df_sub(x, df_mul_f(y, q1))
    q2 = r[0] / y[0]
    return quick_two_sum(q1, q2)


def df_to_f(x):
    return x[0] + x[1]


# --- compensated reductions over lane-major pages ----------------------

def df_sum_pairwise(hi, lo, axis_sizes):
    """Compensated sum of a DF array down to a DF scalar pair of shape
    ``(1, 1)`` via sequential df_adds over both axes, pairwise-halving the
    trailing (lane) axis first.

    ``axis_sizes = (rows, cols)`` static. Cost: log2(cols) + rows df_adds
    of vector values — all VPU, no scalar extraction."""
    rows, cols = axis_sizes
    x = (hi, lo)
    # lane tree: fold the trailing half onto the leading half; an odd
    # middle column rides along unpaired.
    c = cols
    while c > 1:
        h = c // 2
        s = df_add((x[0][:, :h], x[1][:, :h]),
                   (x[0][:, c - h:c], x[1][:, c - h:c]))
        if c % 2:
            x = (jnp.concatenate([s[0], x[0][:, h:h + 1]], axis=1),
                 jnp.concatenate([s[1], x[1][:, h:h + 1]], axis=1))
            c = h + 1
        else:
            x = s
            c = h
    # fold rows sequentially (rows is tiny: the state dimension)
    acc = (x[0][0:1, :], x[1][0:1, :])
    for i in range(1, rows):
        acc = df_add(acc, (x[0][i:i + 1, :], x[1][i:i + 1, :]))
    return acc


def df_dot(a_pair, b, shape):
    """Compensated dot ``sum(a * b)`` where ``a_pair`` is DF and ``b`` is
    f32, both of static ``shape`` = (rows, cols). Returns a (1, 1) DF."""
    p, e = two_prod(a_pair[0], b)
    e = e + a_pair[1] * b
    return df_sum_pairwise(p, e, shape)
