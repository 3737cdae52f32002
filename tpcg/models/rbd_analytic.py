"""Structure-exploiting analytic rigid-body derivatives.

The NMPC full-step metric (bench.py config 6) is dominated by the
linearization: ``jax.vmap(jax.jacfwd(rk4_step))`` over the horizon pushes
n+m tangents through :mod:`tpcg.models.rigid_body`'s Lagrangian dynamics,
whose bias term is itself produced by autodiff (one ``jvp`` + one ``grad``
inside ``_mass_and_bias``). The outer jacfwd therefore differentiates
*through an autodiff graph* — two-level nesting, deep chains of tiny
latency-bound ops on TPU (~5.6 ms of a ~13.7 ms control step at K=128).

This module removes the inner autodiff level entirely: the mass-matrix
gradient tensor ``G[k] = dM/dq_k`` and the gravity gradient come out in
CLOSED FORM from the geometric structure of a serial chain, so the bias
and the forward dynamics are flat masked-einsum expressions. The SQP
layer's ``jacfwd`` then differentiates a single-level closed-form graph.

The geometry (all world-frame; joint k with unit axis ``a_k`` through the
point ``p_k``; everything distal to joint k rotates rigidly about that
line):

* a point ``x`` attached to link ``l >= k``:   ``dx/dq_k = a_k x (x - p_k)``
* a direction ``v`` attached to link ``l >= k``: ``dv/dq_k = a_k x v``
* a rotation ``R_l`` (l >= k):                 ``dR_l/dq_k = [a_k]x R_l``

Dependency masks follow from the chain recursion
(:func:`tpcg.models.rigid_body._fk`): the joint ORIGIN ``p_j`` and the
joint AXIS ``a_j`` ride on link ``j-1`` (affected by ``k < j``); the link
COM ``c_i`` and rotation ``R_i`` ride on link ``i`` (affected by
``k <= i``).

From ``G`` the Coriolis/centrifugal + gravity bias is the Christoffel
contraction (equivalent to the Lagrangian form used by
``rigid_body._mass_and_bias`` — ``b = (dM/dq . qd) qd - 1/2 d(qd^T M qd)/dq
+ dV/dq``):

    ``b_d = sum_{k,j} (G[k,d,j] - 1/2 G[d,k,j]) qd_k qd_j + gvec_d``

Reference parity note: the CUDA reference (A2R-Lab/GBD-PCG) contains no
dynamics — its downstream consumer MPCGPU pairs it with GRiD's hand-coded
device dynamics-gradient kernels (/root/reference/README.md:66-77). This
module is the TPU-native analog of exactly that pairing: analytic
derivative structure feeding the linear-solver core, instead of nested
autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpcg.models.rigid_body import ChainModel, _fk

_HIGH = jax.lax.Precision.HIGHEST


def _skew(v):
    """``(..., 3) -> (..., 3, 3)`` cross-product matrices ``[v]x``."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def _geometry(model: ChainModel, q):
    """Shared FK products: world axes/origins/coms, world inertias, the
    geometric Jacobians, and the dependency masks."""
    N = model.n_joints
    Rs, c, p, a = _fk(model, q)
    R = jnp.stack(Rs)                                        # (N, 3, 3)
    Iw = jnp.einsum('nab,nbc,ndc->nad', R,
                    model.inertias.astype(q.dtype), R, precision=_HIGH)
    idx = jnp.arange(N)
    le = (idx[:, None] <= idx[None, :]).astype(q.dtype)      # [k, i] k <= i
    lt = (idx[:, None] < idx[None, :]).astype(q.dtype)       # [k, j] k < j
    # Jv[i, :, j] = a_j x (c_i - p_j) for j <= i; Jw[i, :, j] = a_j, j <= i
    arms = c[:, None, :] - p[None, :, :]                     # (i, j, 3)
    Jv = jnp.swapaxes(le.T[:, :, None] * jnp.cross(
        jnp.broadcast_to(a[None, :, :], arms.shape), arms), 1, 2)
    Jw = le.T[:, None, :] * jnp.swapaxes(a, 0, 1)[None, :, :]  # (i, 3, j)
    return a, p, c, Iw, Jv, Jw, le, lt


def dmass_dq(model: ChainModel, q):
    """Closed-form mass-matrix gradient ``G`` with ``G[k] = dM(q)/dq_k``,
    shape ``(N, N, N)`` — no autodiff anywhere in the graph."""
    return _dmass_terms(model, q)[0]


def _dmass_terms(model: ChainModel, q):
    """``(G, gvec, geometry)`` sharing one FK pass."""
    N = model.n_joints
    geo = _geometry(model, q)
    a, p, c, Iw, Jv, Jw, le, lt = geo
    m = model.masses.astype(q.dtype)

    # Differentials of the world-frame quantities w.r.t. q_k (leading axis):
    dA = lt[:, :, None] * jnp.cross(a[:, None, :], a[None, :, :])
    dP = lt[:, :, None] * jnp.cross(a[:, None, :],
                                    p[None, :, :] - p[:, None, :])
    dC = le[:, :, None] * jnp.cross(a[:, None, :],
                                    c[None, :, :] - p[:, None, :])
    Ax = _skew(a)                                            # (k, 3, 3)
    dIw = le[:, :, None, None] * (
        jnp.einsum('kab,ibc->kiac', Ax, Iw, precision=_HIGH)
        - jnp.einsum('iab,kbc->kiac', Iw, Ax, precision=_HIGH))

    # dJv[k, i, :, j] = dA[k,j] x (c_i - p_j) + a_j x (dC[k,i] - dP[k,j]),
    # masked to j <= i (column existence) — the per-term k-masks are
    # already inside dA/dC/dP.
    arms = c[:, None, :] - p[None, :, :]                     # (i, j, 3)
    t_axis = jnp.cross(dA[:, None, :, :],                    # (k, 1, j, 3)
                       arms[None, :, :, :])                  # (1, i, j, 3)
    t_point = jnp.cross(jnp.broadcast_to(a[None, None, :, :],
                                         (N, N, N, 3)),
                        dC[:, :, None, :] - dP[:, None, :, :])
    colmask = le.T[None, :, :, None]                         # j <= i
    dJv = jnp.swapaxes(colmask * (t_axis + t_point), 2, 3)   # (k, i, 3, j)
    dJw = jnp.swapaxes(colmask * jnp.broadcast_to(
        dA[:, None, :, :], (N, N, N, 3)), 2, 3)              # (k, i, 3, j)

    mJv = m[:, None, None] * Jv
    t1 = jnp.einsum('kiad,ial->kdl', dJv, mJv, precision=_HIGH)
    t2 = jnp.einsum('kiad,iab,ibl->kdl', dJw, Iw, Jw, precision=_HIGH)
    t3 = jnp.einsum('iad,kiab,ibl->kdl', Jw, dIw, Jw, precision=_HIGH)
    G = t1 + jnp.swapaxes(t1, 1, 2) + t2 + jnp.swapaxes(t2, 1, 2) + t3

    # Gravity gradient: dV/dq_k = g sum_i m_i (dc_i/dq_k)_z.
    gvec = model.gravity * jnp.einsum('i,ki->k', m, dC[:, :, 2],
                                      precision=_HIGH)
    return G, gvec, geo


def bias_forces(model: ChainModel, q, qd):
    """Coriolis/centrifugal + gravity torques, closed form (parity dual of
    :func:`tpcg.models.rigid_body.bias_forces`)."""
    G, gvec, _ = _dmass_terms(model, q)
    quad = jnp.einsum('kdj,k,j->d', G, qd, qd, precision=_HIGH)
    half = jnp.einsum('dkj,k,j->d', G, qd, qd, precision=_HIGH)
    return quad - 0.5 * half + gvec


def forward_dynamics(model: ChainModel, q, qd, tau):
    """``qdd = M^{-1}(tau - damping qd - b)`` with both ``M`` and ``b``
    assembled from one closed-form FK pass — zero autodiff, so an outer
    ``jacfwd`` (the SQP linearizer) stays single-level."""
    G, gvec, geo = _dmass_terms(model, q)
    a, p, c, Iw, Jv, Jw, le, lt = geo
    m = model.masses.astype(q.dtype)
    M = jnp.einsum('i,iad,ial->dl', m, Jv, Jv, precision=_HIGH) \
        + jnp.einsum('iad,iab,ibl->dl', Jw, Iw, Jw, precision=_HIGH) \
        + jnp.diag(model.armature.astype(q.dtype))
    quad = jnp.einsum('kdj,k,j->d', G, qd, qd, precision=_HIGH)
    half = jnp.einsum('dkj,k,j->d', G, qd, qd, precision=_HIGH)
    b = quad - 0.5 * half + gvec
    rhs = tau - model.damping.astype(q.dtype) * qd - b
    with jax.default_matmul_precision("highest"):
        return jnp.linalg.solve(M, rhs)


def rk4_step(model: ChainModel, x, u, dt: float):
    """RK4 over the analytic dynamics — drop-in for
    :func:`tpcg.models.rigid_body.rk4_step` (same discretization, flat
    derivative graph)."""
    n = model.n_joints

    def f(x_):
        q, qd = x_[:n], x_[n:]
        return jnp.concatenate([qd, forward_dynamics(model, q, qd,
                                                     u.astype(x_.dtype))])

    k1 = f(x)
    k2 = f(x + 0.5 * dt * k1)
    k3 = f(x + 0.5 * dt * k2)
    k4 = f(x + dt * k3)
    return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
