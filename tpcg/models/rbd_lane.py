"""Lane-major rigid-body linearization — knots in the trailing (lane) axis.

The NMPC control step is linearize-bound: `sqp._linearize`'s combined
forward-mode pass over :mod:`tpcg.models.rigid_body` measured ~5.5 ms at
iiwa14 K=128 (v5e), dominated not by FLOPs (~100 MFLOP) but by how the
vmapped graph lowers: with the horizon as the LEADING batch dim, every
3x3 rotation product / Jacobian contraction is a ``(K,3,3)`` batched
``dot_general`` whose 3x3 core occupies <1% of an (8,128) TPU tile, and
the mass solve is a batched 7x7 LU — a long chain of tiny padded kernels
that cannot fuse.

This module is the same physics (Lagrangian mechanics, autodiff-derived
bias — parity-tested against :mod:`tpcg.models.rigid_body`) restructured
so the horizon K is the TRAILING axis of every array: structural dims
(3-vectors, 3x3 rotations, the n x n mass matrix) lead, and all small
linear algebra is elementwise multiplies plus reductions over those tiny
leading axes. Zero ``dot_general``, zero batched LU (the mass solve is a
Python-unrolled lane-batched Cholesky) — XLA fuses the chain into wide
VPU loops with K filling the 128-lane dimension.

The trajectory Jacobians (A_k, B_k) come from ONE ``jax.linearize`` of
the lane-major RK4 step plus n+m basis-tangent columns, with the primal
rollout (the defect term) shared from the same pass
(:func:`make_lane_linearizer`, injected via
``TrajOptProblem.linearize``).

Reference parity note: the CUDA reference (A2R-Lab/GBD-PCG) has no
dynamics; its downstream consumer MPCGPU pairs it with GRiD's hand-coded
device dynamics-gradient kernels (/root/reference/README.md:66-77). This
module is that pairing's TPU-native analog: the derivative computation is
laid out for the vector unit instead of hand-derived per-thread CUDA.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpcg.models.rigid_body import ChainModel


def _np_consts(model: ChainModel):
    """Static (trace-time) model constants as numpy — skew matrices of the
    joint axes precomputed for the Rodrigues updates."""
    axes = np.asarray(model.axes, np.float64)
    n = axes.shape[0]
    skews = np.zeros((n, 3, 3))
    for i, (kx, ky, kz) in enumerate(axes):
        skews[i] = [[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]]
    return {
        "n": n,
        "axes": axes,
        "origins": np.asarray(model.origins, np.float64),
        "coms": np.asarray(model.coms, np.float64),
        "inertias": np.asarray(model.inertias, np.float64),
        "masses": np.asarray(model.masses, np.float64),
        "damping": np.asarray(model.damping, np.float64),
        "armature": np.asarray(model.armature, np.float64),
        "gravity": float(model.gravity),
        "skews": skews,
        "skews2": np.einsum("nab,nbc->nac", skews, skews),
    }


def _mv3(M, v):
    """(3,3,K) @ (3,K) -> (3,K) as elementwise mul + tiny reduction."""
    return jnp.sum(M * v[None, :, :], axis=1)


def _mm3(A, B):
    """(3,3,K) @ (3,3,K) -> (3,3,K)."""
    return jnp.sum(A[:, :, None, :] * B[None, :, :, :], axis=1)


def _fk_t(cs, q):
    """Forward kinematics, K-trailing (parity dual of rigid_body._fk):
    returns world rotations (n,3,3,K), COMs / joint origins / joint axes
    (n,3,K each)."""
    n = cs["n"]
    dtype = q.dtype
    K = q.shape[-1]
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[:, :, None],
                         (3, 3, K))
    p = jnp.zeros((3, K), dtype)
    Rs, coms, joints, axes_w = [], [], [], []
    eye3 = jnp.eye(3, dtype=dtype)[:, :, None]
    for i in range(n):
        o = jnp.asarray(cs["origins"][i], dtype)[:, None]
        a = jnp.asarray(cs["axes"][i], dtype)[:, None]
        Kx = jnp.asarray(cs["skews"][i], dtype)[:, :, None]
        K2 = jnp.asarray(cs["skews2"][i], dtype)[:, :, None]
        p = p + jnp.sum(R * o[None, :, :], axis=1)
        axes_w.append(jnp.sum(R * a[None, :, :], axis=1))
        s = jnp.sin(q[i])
        cc = 1.0 - jnp.cos(q[i])
        Rj = eye3 + s[None, None, :] * Kx + cc[None, None, :] * K2
        R = _mm3(R, Rj)
        Rs.append(R)
        joints.append(p)
        c = jnp.asarray(cs["coms"][i], dtype)[:, None]
        coms.append(p + jnp.sum(R * c[None, :, :], axis=1))
    return (jnp.stack(Rs), jnp.stack(coms), jnp.stack(joints),
            jnp.stack(axes_w))


def _mass_t(cs, fk, dtype):
    """Joint-space inertia (n,n,K) from K-trailing FK (parity dual of
    rigid_body._mass_from_fk — geometric COM Jacobian assembly). All
    contractions are elementwise products reduced over the tiny
    structural axes; the only K-sized dimension rides the lanes."""
    n = cs["n"]
    Rs, coms, joints, axes_w = fk
    le = jnp.asarray(np.tril(np.ones((n, n))), dtype)          # j <= i

    # Jv[i,j,:,K] = a_j x (c_i - p_j), masked to j <= i
    arms = coms[:, None, :, :] - joints[None, :, :, :]          # (i,j,3,K)
    aw_b = jnp.broadcast_to(axes_w[None, :, :, :], arms.shape)
    Jv = le[:, :, None, None] * jnp.cross(aw_b, arms, axis=2)

    # Iw_i = R_i I_i R_i^T
    Ic = jnp.asarray(cs["inertias"], dtype)                     # (n,3,3)
    T1 = jnp.sum(Rs[:, :, :, None, :] * Ic[:, None, :, :, None],
                 axis=2)                                        # (n,3,3,K)
    Iw = jnp.sum(T1[:, :, None, :, :] * Rs[:, None, :, :, :],
                 axis=3)                                        # (n,3,3,K)

    m = jnp.asarray(cs["masses"], dtype)
    # translational: M_v[d,l] = sum_i m_i <Jv[i,d], Jv[i,l]>
    Mv = jnp.sum(m[:, None, None, None, None]
                 * Jv[:, :, None, :, :] * Jv[:, None, :, :, :],
                 axis=(0, 3))                                   # (n,n,K)
    # rotational: w[i,l,:,K] = Iw_i a_l (masked l <= i), then
    # M_w[d,l] = sum_i <a_d, w[i,l]> (masked d <= i)
    w = jnp.sum(Iw[:, None, :, :, :]
                * axes_w[None, :, None, :, :], axis=3)          # (i,l,3,K)
    w = le[:, :, None, None] * w
    a_d = axes_w[None, :, None, :, :]                           # (1,d,1,3,K)
    w_il = w[:, None, :, :, :]                                  # (i,1,l,3,K)
    Mw = jnp.sum(a_d * w_il, axis=3)                            # (i,d,l,K)
    Mw = jnp.sum(le[:, :, None, None] * Mw, axis=0)             # (n,n,K)

    M = Mv + Mw + jnp.asarray(np.diag(cs["armature"]),
                              dtype)[:, :, None]
    return M


def _chol_solve_t(M, rhs):
    """Unrolled lane-batched Cholesky solve: ``M (n,n,K)`` SPD (mass +
    armature — well-conditioned by construction), ``rhs (n,K)``. Pure
    elementwise ops on (K,) lane vectors — replaces the batched LU of
    ``jnp.linalg.solve`` (shared helper, tpcg/ops/lanelin.py)."""
    from tpcg.ops.lanelin import chol_solve_lane
    return chol_solve_lane(M, rhs)


def _mass_and_bias_t(cs, q, qd):
    """``(M, b)`` with the same shared-autodiff structure as
    rigid_body._mass_and_bias — one ``jvp`` of the mass map in direction
    ``qd``, one ``vjp`` of the per-lane scalar ``V - T`` — over the
    K-trailing graph, so every derived op stays lane-elementwise."""
    dtype = q.dtype

    def mass_fn(qq):
        return _mass_t(cs, _fk_t(cs, qq), dtype)

    M, dMqd = jax.jvp(mass_fn, (q,), (qd,))

    g_m = jnp.asarray(cs["gravity"] * cs["masses"], dtype)      # (n,)

    def neg_lag(qq):
        fk = _fk_t(cs, qq)
        Mq = _mass_t(cs, fk, dtype)
        V = jnp.sum(g_m[:, None] * fk[1][:, 2, :], axis=0)      # (K,)
        T = 0.5 * jnp.sum(Mq * qd[:, None, :] * qd[None, :, :],
                          axis=(0, 1))
        return V - T

    _, pull = jax.vjp(neg_lag, q)
    (gl,) = pull(jnp.ones(q.shape[-1:], dtype))

    b = jnp.sum(dMqd * qd[None, :, :], axis=1) + gl             # (n,K)
    return M, b


def _fd_t(cs, q, qd, tau):
    """Forward dynamics ``qdd (n,K)`` (parity dual of
    rigid_body.forward_dynamics)."""
    M, b = _mass_and_bias_t(cs, q, qd)
    damp = jnp.asarray(cs["damping"], q.dtype)[:, None]
    return _chol_solve_t(M, tau - damp * qd - b)


def _rk4_t(cs, x, u, dt):
    """RK4 over the K-trailing dynamics — same discretization as
    rigid_body.rk4_step. ``x (2n,K)``, ``u (n,K)``."""
    n = cs["n"]

    def f(x_):
        return jnp.concatenate([x_[n:], _fd_t(cs, x_[:n], x_[n:], u)])

    k1 = f(x)
    k2 = f(x + 0.5 * dt * k1)
    k3 = f(x + 0.5 * dt * k2)
    k4 = f(x + dt * k3)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def rk4_step(model: ChainModel, x, u, dt: float):
    """Single-sample convenience wrapper (parity tests): ``x (2n,)``,
    ``u (n,)`` — runs the lane code with lane width 1."""
    cs = _np_consts(model)
    out = _rk4_t(cs, x[:, None], u.astype(x.dtype)[:, None], dt)
    return out[:, 0]


def _heun_t(cs, x, u, dt):
    """Heun (explicit trapezoid, 2 stages) over the K-trailing dynamics —
    the cheap variational integrator for :func:`make_lane_linearizer`'s
    inexact-Jacobian mode."""
    n = cs["n"]

    def f(x_):
        return jnp.concatenate([x_[n:], _fd_t(cs, x_[:n], x_[n:], u)])

    k1 = f(x)
    k2 = f(x + dt * k1)
    return x + (dt / 2.0) * (k1 + k2)


def _euler_t(cs, x, u, dt):
    """Explicit Euler (1 stage) over the K-trailing dynamics."""
    n = cs["n"]
    qd = x[n:]
    return x + dt * jnp.concatenate([qd, _fd_t(cs, x[:n], qd, u)])


_JAC_STEPS = {"rk4": _rk4_t, "heun": _heun_t, "euler": _euler_t}


def make_lane_rollout(model: ChainModel, dt: float):
    """Build ``rollout(X, U) -> F (K-1, n)`` — the primal-only RK4 pass
    over the K-trailing dynamics, for injection via
    ``TrajOptProblem.rollout``. Exactly the primal half of
    :func:`make_lane_linearizer` (same ``_rk4_t`` graph, bit-identical
    semantics), with no tangent columns — the cheap piece lagged-Jacobian
    RTI recomputes every control step while A/B are reused (measured: the
    21-column tangent pass is ~20/21 of the linearize cost)."""
    cs = _np_consts(model)
    n2 = 2 * cs["n"]

    def rollout(X, U):
        xu = jnp.concatenate([X[:-1].T, U.astype(X.dtype).T], axis=0)
        return _rk4_t(cs, xu[:n2], xu[n2:], dt).T

    return rollout


def make_lane_linearizer(model: ChainModel, dt: float,
                         jac_integrator: str = "rk4"):
    """Build ``linearize(X, U) -> (A, B, F)`` for injection via
    ``TrajOptProblem.linearize``: one ``jax.linearize`` of the K-trailing
    RK4 step, n+m basis-tangent columns (each a rank-manageable vmap
    lane), primal rollout shared (the defect term comes free).

    ``jac_integrator`` selects the integrator the TANGENTS propagate
    through. ``"rk4"`` (default) is the exact Jacobian of the rollout.
    ``"heun"`` / ``"euler"`` propagate tangents through a 2- / 1-stage
    variational pass instead — the classic real-time-iteration
    inexact-Jacobian trade: the primal rollout ``F`` (hence the defect,
    hence the solution manifold) stays exact RK4, while ``A``/``B`` carry
    an O(dt^3) / O(dt^2) local discretization error that Gauss-Newton
    absorbs as a slightly perturbed step operator. The tangent pass is
    where ~20/21 of the linearize cost lives (n2+m basis columns vs one
    primal), so cutting its stage count 4 -> 2 nearly halves the NMPC
    step's dominant term (measured in bench.py's NMPC stage; closed-loop
    parity in tests/test_nmpc.py)."""
    if jac_integrator not in _JAC_STEPS:
        raise ValueError(f"jac_integrator must be one of "
                         f"{sorted(_JAC_STEPS)}, got {jac_integrator!r}")
    cs = _np_consts(model)
    n2 = 2 * cs["n"]
    m = cs["n"]
    jac_step = _JAC_STEPS[jac_integrator]

    def linearize(X, U):
        xu = jnp.concatenate([X[:-1].T, U.astype(X.dtype).T], axis=0)

        def step(xu_):
            return jac_step(cs, xu_[:n2], xu_[n2:], dt)

        prim, lin = jax.linearize(step, xu)
        if jac_integrator != "rk4":
            # defects must see the TRUE discretization — only the
            # tangents ride the cheap integrator
            prim = _rk4_t(cs, xu[:n2], xu[n2:], dt)
        eye = jnp.eye(n2 + m, dtype=X.dtype)
        cols = jax.vmap(
            lambda e: lin(jnp.broadcast_to(e[:, None], xu.shape)))(eye)
        J = jnp.transpose(cols, (2, 1, 0))      # (K-1, n2, n2+m)
        return J[:, :, :n2], J[:, :, n2:], prim.T

    return linearize
