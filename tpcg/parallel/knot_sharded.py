"""Knot-axis (trajectory-time) domain decomposition over a device mesh.

The TPU scale-out of the reference's one-thread-block-per-knot decomposition
(SURVEY.md §5.7/§5.8): the reference co-schedules all knot blocks on one GPU
and synchronizes with cooperative-groups ``grid.sync()``, bounding
knot_points by resident-block capacity (pcg.cuh:43-46). Here the knot axis is
sharded over ICI with ``shard_map``:

* the radius-1 **halo exchange** the reference does through global memory +
  grid.sync (``loadbdVec``, utils.cuh:9-40, after the barriers at
  pcg.cuh:128,178) becomes one ``lax.ppermute`` of a single
  ``(1, state_size)`` boundary row per direction per SpMV;
* the hand-rolled **all-reduce** of per-knot partial dots
  (d_v_temp/d_eta_new_temp + glass::reduce, pcg.cuh:144-149,163-169,187-193)
  becomes ``lax.psum`` over the mesh axis;
* the 4 grid-wide barriers per iteration disappear — XLA's collective
  schedule is the synchronization.

There is no per-device residency limit: each shard's knot slice is just a
bigger lane-major tile, so knot_points scales with devices x VMEM instead of
SMs x occupancy.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpcg.types import BlockTridiag, PCGConfig, PCGResult


def _neighbor_perms(nd: int):
    """Non-wrapping shift perms; missing sources yield zeros at chain ends
    (lax.ppermute semantics), which is exactly the boundary condition."""
    fwd = [(i, i + 1) for i in range(nd - 1)]   # send to right neighbor
    bwd = [(i + 1, i) for i in range(nd - 1)]   # send to left neighbor
    return fwd, bwd


def bdmv_knot_sharded(blocks_loc, x_loc, axis_name: str, nd: int):
    """Local shard of ``y = S @ x``: blocks_loc ``(K/nd, 3, n, n)``, x_loc
    ``(K/nd, n)``. One ppermute per direction supplies the halo rows."""
    fwd, bwd = _neighbor_perms(nd)
    # halo from left neighbor: its LAST row becomes our k=-1 row
    left_halo = jax.lax.ppermute(x_loc[-1:], axis_name, perm=fwd)
    # halo from right neighbor: its FIRST row becomes our k=K_loc row
    right_halo = jax.lax.ppermute(x_loc[:1], axis_name, perm=bwd)
    x_dn = jnp.concatenate([left_halo, x_loc[:-1]], axis=0)
    x_up = jnp.concatenate([x_loc[1:], right_halo], axis=0)
    # precision pinned: bf16-grade MXU defaults perturb iteration counts
    prec = jax.lax.Precision.HIGHEST
    y = jnp.einsum('knm,km->kn', blocks_loc[:, 1], x_loc, precision=prec)
    y = y + jnp.einsum('knm,km->kn', blocks_loc[:, 0], x_dn, precision=prec)
    y = y + jnp.einsum('knm,km->kn', blocks_loc[:, 2], x_up, precision=prec)
    return y


class _Carry(NamedTuple):
    lam: jax.Array
    r: jax.Array
    p: jax.Array
    eta: jax.Array
    iters: jax.Array
    converged: jax.Array


@functools.partial(jax.jit,
                   static_argnames=("mesh", "axis_name", "max_iter",
                                    "identity_pinv", "method",
                                    "stop_on_nonfinite", "precond_refine",
                                    "replace_every"))
def pcg_knot_sharded(S_blocks, Pinv_blocks, gamma, lam0, *, mesh: Mesh,
                     axis_name: str = "knot", exit_tol, max_iter: int,
                     identity_pinv: bool = False,
                     method: str = "classic",
                     stop_on_nonfinite: bool = False,
                     precond_refine: int = 0,
                     replace_every: int = 16) -> PCGResult:
    """Full PCG with the knot axis sharded over ``mesh[axis_name]``.

    Inputs are global-shape canonical arrays (``(K, 3, n, n)`` / ``(K, n)``);
    K must be divisible by the mesh axis size. Semantics (update order, exit
    test, iteration count) identical to the single-core backends.

    ``method="pipelined"`` (Ghysels-Vanroose, tpcg/solver/pipelined.py) is
    most valuable HERE: the classic loop pays two ``psum`` latencies per
    iteration over ICI (the TPU analog of the reference's two
    grid.sync+reduce rounds, pcg.cuh:163-169,187-193); the pipelined loop
    pays one, and XLA can overlap it with the independent
    preconditioner/SpMV applications.

    ``precond_refine`` is the other ICI lever: each Neumann refinement of
    the preconditioner apply costs only LOCAL work plus cheap (1, n)
    ppermute halos, while cutting the number of iterations — and with them
    the expensive psum rounds (measured iteration counts at iiwa14 K=128:
    34 -> 24/20/17 at 1/2/3 steps).
    """
    nd = mesh.shape[axis_name]
    K = gamma.shape[-2]
    if K % nd != 0:
        raise ValueError(f"knot_points={K} not divisible by mesh axis "
                         f"'{axis_name}' size {nd}")
    if method in ("fixed", "fixed_pipelined") and stop_on_nonfinite:
        raise ValueError(f"method={method!r} has no per-iteration tests "
                         "by design; drop stop_on_nonfinite")

    mv = functools.partial(bdmv_knot_sharded, axis_name=axis_name, nd=nd)

    def vdot(a, b):
        return jax.lax.psum(jnp.sum(a * b), axis_name)

    def solve_local(S_loc, P_loc, g_loc, l_loc):
        tol = jnp.asarray(exit_tol, g_loc.dtype)

        def apply_pinv(v):
            if identity_pinv:
                return v
            z = mv(P_loc, v)
            for _ in range(precond_refine):
                z = z + mv(P_loc, v - mv(S_loc, z))
            return z

        if method == "pipelined":
            from tpcg.solver.pipelined import pipelined_pcg_body
            return pipelined_pcg_body(
                lambda v: mv(S_loc, v), apply_pinv, vdot, g_loc, l_loc,
                tol, max_iter, stop_on_nonfinite,
                replace_every=replace_every)

        if method == "fixed_pipelined":
            # bounded-latency mode over collectives: a STATIC trip count
            # makes identical collective sequences true by construction
            # (the deadlock invariant this module otherwise maintains with
            # the psum'd done flag), and the zero-sync recurrence drops
            # both per-iteration exit psk rounds to one psum for the dots
            from tpcg.solver.pipelined import fixed_pipelined_body
            x, eta = fixed_pipelined_body(
                lambda v: mv(S_loc, v), apply_pinv, vdot, g_loc, l_loc,
                max_iter)
            return (x, jnp.asarray(max_iter, jnp.int32),
                    jnp.abs(eta) < tol, eta)

        if method == "fixed":
            tiny = jnp.asarray(1e-30, g_loc.dtype)
            r = g_loc - mv(S_loc, l_loc)
            rt = apply_pinv(r)
            eta0 = vdot(r, rt)

            def fbody(_, c):
                lam, r, p, eta = c
                ups = mv(S_loc, p)
                alpha = eta / (vdot(p, ups) + tiny)
                lam = lam + alpha * p
                r = r - alpha * ups
                rt = apply_pinv(r)
                eta_new = vdot(r, rt)
                beta = eta_new / (eta + tiny)
                p = rt + beta * p
                return (lam, r, p, eta_new)

            lam, r, p, eta = jax.lax.fori_loop(
                0, max_iter, fbody, (l_loc, r, rt, eta0))
            return (lam, jnp.asarray(max_iter, jnp.int32),
                    jnp.abs(eta) < tol, eta)

        r = g_loc - mv(S_loc, l_loc)
        rt = apply_pinv(r)
        p = rt
        eta = vdot(r, rt)

        def cond(c):
            go = jnp.logical_and(c.iters < max_iter,
                                 jnp.logical_not(c.converged))
            if stop_on_nonfinite:
                go = jnp.logical_and(go, jnp.isfinite(c.eta))
            return go

        def body(c):
            ups = mv(S_loc, c.p)
            alpha = c.eta / vdot(c.p, ups)
            lam = c.lam + alpha * c.p
            r = c.r - alpha * ups
            rt = apply_pinv(r)
            eta_new = vdot(r, rt)
            converged = jnp.abs(eta_new) < tol
            beta = eta_new / c.eta
            p = rt + beta * c.p
            return _Carry(lam, r, p, eta_new, c.iters + 1, converged)

        out = jax.lax.while_loop(
            cond, body,
            _Carry(l_loc, r, p, eta, jnp.zeros((), jnp.int32),
                   jnp.abs(eta) < tol))
        return out.lam, out.iters, out.converged, out.eta

    shard = P(axis_name)
    lam, iters, conv, eta = jax.shard_map(
        solve_local, mesh=mesh,
        in_specs=(shard, shard, shard, shard),
        out_specs=(shard, P(), P(), P()),
        check_vma=False,
    )(S_blocks, S_blocks if Pinv_blocks is None else Pinv_blocks,
      gamma, lam0)
    return PCGResult(lam=lam, iters=iters, converged=conv, eta=eta)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "axis_name", "batch_axis_name",
                                    "max_iter", "identity_pinv", "method",
                                    "stop_on_nonfinite", "precond_refine",
                                    "replace_every"))
def pcg_knot_sharded_batched(S_blocks, Pinv_blocks, gamma, lam0, *,
                             mesh: Mesh, axis_name: str = "knot",
                             batch_axis_name: Optional[str] = "batch",
                             exit_tol, max_iter: int,
                             identity_pinv: bool = False,
                             method: str = "classic",
                             stop_on_nonfinite: bool = False,
                             precond_refine: int = 0,
                             replace_every: int = 16) -> PCGResult:
    """Fleet of B systems, each with its knot axis sharded: the 2D-mesh
    (batch x knot) composition — batch is the zero-communication DCN-friendly
    axis, knot halos/reductions ride ICI.

    Inputs: ``S_blocks (B, K, 3, n, n)``, vectors ``(B, K, n)``. Per-system
    semantics match independent solves exactly: converged (or, with
    ``stop_on_nonfinite``, diverged) systems are frozen (masked updates)
    while the fleet loop runs until all halt or ``max_iter``; per-system
    ``iters``/``converged``/``eta`` are returned.

    ``method="pipelined"`` runs the Ghysels-Vanroose recurrences
    (tpcg/solver/pipelined.py) with the same per-system freeze discipline —
    one psum pair per iteration instead of two, the configuration most
    valuable over ICI.
    """
    nd = mesh.shape[axis_name]
    K = gamma.shape[-2]
    if K % nd != 0:
        raise ValueError(f"knot_points={K} not divisible by mesh axis "
                         f"'{axis_name}' size {nd}")
    if batch_axis_name is not None:
        nb = mesh.shape[batch_axis_name]
        if gamma.shape[0] % nb != 0:
            raise ValueError(
                f"batch={gamma.shape[0]} not divisible by mesh axis "
                f"'{batch_axis_name}' size {nb}")

    def mv(blocks_loc, x_loc):
        # batched local bdmv with halo rows exchanged along the knot axis
        fwd, bwd = _neighbor_perms(nd)
        left_halo = jax.lax.ppermute(x_loc[:, -1:], axis_name, perm=fwd)
        right_halo = jax.lax.ppermute(x_loc[:, :1], axis_name, perm=bwd)
        x_dn = jnp.concatenate([left_halo, x_loc[:, :-1]], axis=1)
        x_up = jnp.concatenate([x_loc[:, 1:], right_halo], axis=1)
        # precision pinned: bf16-grade MXU defaults perturb iteration counts
        prec = jax.lax.Precision.HIGHEST
        y = jnp.einsum('bknm,bkm->bkn', blocks_loc[:, :, 1], x_loc,
                       precision=prec)
        y = y + jnp.einsum('bknm,bkm->bkn', blocks_loc[:, :, 0], x_dn,
                           precision=prec)
        y = y + jnp.einsum('bknm,bkm->bkn', blocks_loc[:, :, 2], x_up,
                           precision=prec)
        return y

    def vdot(a, b):
        return jax.lax.psum(jnp.sum(a * b, axis=(-2, -1)), axis_name)

    def fleet_done(halted):
        # Trip counts MUST be identical on every device of the mesh:
        # the knot-axis ppermute/psum are global collectives, so a batch
        # shard exiting early would deadlock the others. Agree on "done"
        # across the batch axis.
        done = jnp.all(halted)
        if batch_axis_name is not None:
            done = jax.lax.psum(done.astype(jnp.int32),
                                batch_axis_name) >= mesh.shape[
                                    batch_axis_name]
        return done

    def halt_mask(converged, eta):
        # "halted" freezes a system: converged, or (with the divergence
        # guard on) eta gone non-finite — the latter stays converged=False.
        if stop_on_nonfinite:
            return jnp.logical_or(converged, jnp.logical_not(
                jnp.isfinite(eta)))
        return converged

    def refined_pinv(S_loc, P_loc):
        def apply_pinv(v):
            if identity_pinv:
                return v
            z = mv(P_loc, v)
            for _ in range(precond_refine):
                z = z + mv(P_loc, v - mv(S_loc, z))
            return z
        return apply_pinv

    def solve_classic_local(S_loc, P_loc, g_loc, l_loc):
        tol = jnp.asarray(exit_tol, g_loc.dtype)
        B_loc = g_loc.shape[0]
        apply_pinv = refined_pinv(S_loc, P_loc)

        r = g_loc - mv(S_loc, l_loc)
        rt = apply_pinv(r)
        p = rt
        eta = vdot(r, rt)   # (B_loc,)

        def cond(c):
            lam, r, p, eta, iters, converged, step, done = c
            return jnp.logical_and(step < max_iter,
                                   jnp.logical_not(done))

        def body(c):
            lam, r, p, eta, iters, converged, step, _ = c
            active = jnp.logical_not(halt_mask(converged, eta))  # (B_loc,)
            am = active[:, None, None]
            ups = mv(S_loc, p)
            alpha = eta / vdot(p, ups)
            # jnp.where, NOT a 0/1 mask multiply: a system converged at
            # entry has alpha = 0/0 = NaN, and 0 * NaN = NaN would poison
            # its (final) multipliers
            lam = jnp.where(am, lam + alpha[:, None, None] * p, lam)
            r = jnp.where(am, r - alpha[:, None, None] * ups, r)
            rt = apply_pinv(r)
            eta_new = jnp.where(active, vdot(r, rt), eta)
            conv_new = jnp.logical_and(active, jnp.abs(eta_new) < tol)
            beta = eta_new / eta
            # freeze p (and eta via eta_new above) for halted systems
            p = jnp.where(am, rt + beta[:, None, None] * p, p)
            iters = iters + active.astype(jnp.int32)
            converged = jnp.logical_or(converged, conv_new)
            return (lam, r, p, eta_new, iters, converged, step + 1,
                    fleet_done(halt_mask(converged, eta_new)))

        conv0 = jnp.abs(eta) < tol
        init = (l_loc, r, p, eta, jnp.zeros((B_loc,), jnp.int32),
                conv0, jnp.zeros((), jnp.int32),
                fleet_done(halt_mask(conv0, eta)))
        lam, r, p, eta, iters, converged, _, _ = jax.lax.while_loop(
            cond, body, init)
        return lam, iters, converged, eta

    def solve_pipelined_local(S_loc, P_loc, g_loc, l_loc):
        # Ghysels-Vanroose recurrences (tpcg/solver/pipelined.py) with
        # per-system freeze masks; both dots share ONE psum round.
        tol = jnp.asarray(exit_tol, g_loc.dtype)
        B_loc = g_loc.shape[0]
        apply_pinv = refined_pinv(S_loc, P_loc)
        smv = lambda v: mv(S_loc, v)

        r = g_loc - smv(l_loc)
        u = apply_pinv(r)
        w = smv(u)
        zeros = jnp.zeros_like(r)
        eta0 = vdot(r, u)

        def cond(c):
            return jnp.logical_and(c[-2] < max_iter,
                                   jnp.logical_not(c[-1]))

        def body(c):
            (x, r, u, w, z, q, s, p, eta_prev, alpha_prev, iters,
             converged, step, _) = c
            active = jnp.logical_not(halt_mask(converged, eta_prev))
            am = active[:, None, None]
            eta = jnp.where(active, vdot(r, u), eta_prev)
            delta = vdot(w, u)
            m = apply_pinv(w)
            nn = smv(m)
            first = step == 0  # iters == step while a system is active
            beta = jnp.where(first, jnp.zeros_like(eta), eta / eta_prev)
            alpha = jnp.where(
                first, eta / delta,
                eta / (delta - beta * eta / alpha_prev))
            a3, b3 = alpha[:, None, None], beta[:, None, None]
            z = jnp.where(am, nn + b3 * z, z)
            q = jnp.where(am, m + b3 * q, q)
            s = jnp.where(am, w + b3 * s, s)
            p = jnp.where(am, u + b3 * p, p)
            x = jnp.where(am, x + a3 * p, x)
            r = jnp.where(am, r - a3 * s, r)
            u = jnp.where(am, u - a3 * q, u)
            w = jnp.where(am, w - a3 * z, w)
            if replace_every:
                def replace(args):
                    x, p, *_ = args
                    r = g_loc - smv(x)
                    u = apply_pinv(r)
                    w = smv(u)
                    s = smv(p)
                    q = apply_pinv(s)
                    z = smv(q)
                    return (x, p, r, u, w, s, q, z)

                # scalar cadence (same trip count fleet-wide; halted
                # systems' recomputed auxiliaries are unused)
                re32 = jnp.int32(replace_every)  # i64-safe under x64
                do_replace = jnp.logical_and(
                    step % re32 == re32 - jnp.int32(1), step > jnp.int32(0))
                x, p, r, u, w, s, q, z = jax.lax.cond(
                    do_replace, replace, lambda args: args,
                    (x, p, r, u, w, s, q, z))
            conv_new = jnp.logical_and(active, jnp.abs(eta) < tol)
            converged = jnp.logical_or(converged, conv_new)
            alpha_prev = jnp.where(active, alpha, alpha_prev)
            iters = iters + active.astype(jnp.int32)
            return (x, r, u, w, z, q, s, p, eta, alpha_prev, iters,
                    converged, step + 1,
                    fleet_done(halt_mask(converged, eta)))

        conv0 = jnp.abs(eta0) < tol
        init = (l_loc, r, u, w, zeros, zeros, zeros, zeros, eta0,
                jnp.ones((B_loc,), g_loc.dtype),
                jnp.zeros((B_loc,), jnp.int32), conv0,
                jnp.zeros((), jnp.int32),
                fleet_done(halt_mask(conv0, eta0)))
        out = jax.lax.while_loop(cond, body, init)
        x, eta, iters, converged = out[0], out[8], out[10], out[11]
        return x, iters, converged, eta

    if method == "pipelined":
        solve_local = solve_pipelined_local
    elif method == "classic":
        solve_local = solve_classic_local
    else:
        raise ValueError(f"method must be 'classic' or 'pipelined', "
                         f"got {method!r}")

    bspec = (P() if batch_axis_name is None else P(batch_axis_name))
    shard = P(*bspec, axis_name)
    lam, iters, conv, eta = jax.shard_map(
        solve_local, mesh=mesh,
        in_specs=(shard, shard, shard, shard),
        out_specs=(shard, bspec, bspec, bspec),
        check_vma=False,
    )(S_blocks, S_blocks if Pinv_blocks is None else Pinv_blocks,
      gamma, lam0)
    return PCGResult(lam=lam, iters=iters, converged=conv, eta=eta)


def pcg_solve_sharded(S, gamma, lam0=None, *, mesh: Mesh,
                      axis_name: str = "knot",
                      config: Optional[PCGConfig] = None,
                      Pinv: Optional[BlockTridiag] = None,
                      comm: str = "xla",
                      interpret_params=None) -> PCGResult:
    """Convenience wrapper: builds the preconditioner, shards inputs over the
    mesh, and runs the knot-sharded solve.

    ``comm`` selects the communication substrate:

    * ``"xla"`` (default) — this module's shard_map solver: XLA inserts
      ppermute/psum collectives between compiled steps. Production path.
    * ``"rdma"`` — the persistent in-kernel RDMA kernel
      (tpcg/parallel/rdma_knot.py): one Pallas kernel per device for the
      whole solve, `make_async_remote_copy` halos + mailbox all-reduces.
      Supports identity / explicit cbtd Pinv / in-kernel block_jacobi and
      symmetric_stair construction, classic + pipelined methods. On CPU
      meshes pass ``interpret_params`` (the distributed TPU interpreter);
      ``stop_on_nonfinite`` / ``precond_refine`` / banded ``stair_refined``
      are not plumbed there yet — use ``comm="xla"`` for those.
    """
    from tpcg import precond
    from tpcg.solver.api import _as_bt

    S = _as_bt(S)
    gamma = jnp.asarray(gamma)
    lam0 = jnp.zeros_like(gamma) if lam0 is None else jnp.asarray(lam0)
    config = config or PCGConfig()
    if comm not in ("xla", "rdma"):
        raise ValueError(f"comm must be 'xla' or 'rdma', got {comm!r}")

    if comm == "rdma":
        from tpcg.parallel.rdma_knot import pcg_rdma_sharded

        if config.stop_on_nonfinite or config.precond_refine:
            raise ValueError("comm='rdma' has no stop_on_nonfinite/"
                             "precond_refine plumbing; use comm='xla'")
        in_kernel = (Pinv is None and
                     config.preconditioner in ("block_jacobi",
                                               "symmetric_stair"))
        identity = config.preconditioner == "identity" and Pinv is None
        pinv_blocks = None
        if not identity and not in_kernel:
            pinv_blocks = precond.materialize(S, config, Pinv).blocks
        sharding = NamedSharding(mesh, P(axis_name))
        put = lambda a: (a if a is None
                         else jax.device_put(a, sharding))
        return pcg_rdma_sharded(
            put(S.blocks), put(pinv_blocks), put(gamma), put(lam0),
            mesh=mesh, axis_name=axis_name, exit_tol=config.exit_tol,
            max_iter=config.max_iter, method=config.method,
            precond=config.preconditioner if in_kernel else None,
            replace_every=config.replace_every,
            interpret_params=interpret_params)

    identity = config.preconditioner == "identity" and Pinv is None
    pinv_blocks = None
    if not identity:
        pinv_blocks = precond.materialize(S, config, Pinv).blocks

    sharding = NamedSharding(mesh, P(axis_name))
    S_blocks = jax.device_put(S.blocks, sharding)
    gamma = jax.device_put(gamma, sharding)
    lam0 = jax.device_put(lam0, sharding)
    if pinv_blocks is not None:
        pinv_blocks = jax.device_put(pinv_blocks, sharding)
    return pcg_knot_sharded(S_blocks, pinv_blocks, gamma, lam0, mesh=mesh,
                            axis_name=axis_name, exit_tol=config.exit_tol,
                            max_iter=config.max_iter,
                            identity_pinv=identity, method=config.method,
                            stop_on_nonfinite=config.stop_on_nonfinite,
                            precond_refine=config.precond_refine,
                            replace_every=config.replace_every)
