"""Persistent multi-chip PCG: ONE Pallas kernel per device for the WHOLE
solve, with in-kernel RDMA halo exchange and mailbox all-reduces — the
faithful multi-chip transplant of the reference's cooperative single-GPU
kernel (/root/reference/include/pcg.cuh:54-218).

The reference's communication substrate is "global memory as mailbox +
grid.sync() as barrier" (SURVEY.md §5.8): thread-blocks spill vector edge
segments and per-block dot partials to HBM, barrier, and re-read. Across
TPU chips the same architecture becomes:

* halo exchange = ``pltpu.make_async_remote_copy`` of the shard's edge
  column to each neighbor's VMEM halo buffer (the loadbdVec analog,
  utils.cuh:9-40, over ICI instead of HBM);
* scalar all-reduce = every device remote-writes its (1, lanes) dot
  partial into a slot of every other device's mailbox buffer, waits for
  all arrivals, and reduces locally IN A FIXED ORDER — exactly the
  d_v_temp/d_eta_new_temp + glass::reduce pattern (pcg.cuh:144-149),
  device-for-thread-block. The fixed order makes every device compute
  bit-identical eta, so the shared while predicate cannot diverge (the
  collective-deadlock invariant of tpcg/parallel/knot_sharded.py, held
  here by construction);
* grid.sync() = the semaphore discipline itself. Two mailbox rounds per
  iteration separate same-buffer halo reuses (alternating A/B halo
  buffers), mirroring the reference's 4 in-loop barriers; explicit
  barrier-semaphore rounds guard kernel start/teardown (a device must
  not free buffers while a neighbor's in-flight DMA still reads them).

Where tpcg/parallel/knot_sharded.py lets XLA insert ppermute/psum
collectives BETWEEN compiled steps, this kernel owns the communication
schedule end to end — no per-iteration XLA collective launches, one
persistent kernel per chip for the entire solve.

Verification story (this environment has ONE physical chip): the kernel
runs under Pallas TPU *distributed interpret mode* (JAX's multi-device
shared-memory simulator: real semaphore semantics, real remote-DMA
routing, optional happens-before race detection) on the 8-virtual-device
CPU mesh — tests assert parity against the jnp oracle and run the race
detector over a full solve. On real multi-chip hardware the same code
lowers to ICI RDMA; that path is compile-checked only when such hardware
exists (docs/ROADMAP.md item 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from tpcg.types import PCGResult

_LOGICAL = pltpu.DeviceIdType.LOGICAL


def _kernel(tol_ref, S_ref, pinv_ref, gamma_ref, lam0_ref,
            lam_ref, iters_ref, conv_ref, eta_ref,
            send_l, send_r, recvA_l, recvA_r, recvB_l, recvB_r,
            mbA, mbB, part_buf,
            hsend_l, hsend_r, hrecvA_l, hrecvA_r, hrecvB_l, hrecvB_r,
            mb_send, mbA_recv, mbB_recv,
            *, n, Kd, D, max_iter, axis_name, method="classic",
            precond="explicit", mb_rows=8, replace_every=16):
    my = jax.lax.axis_index(axis_name)
    left = jax.lax.rem(my - 1 + D, jnp.int32(D))
    right = jax.lax.rem(my + 1, jnp.int32(D))
    first = my == 0
    last = my == D - 1

    def barrier():
        sem = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(sem, device_id=left, device_id_type=_LOGICAL)
        pltpu.semaphore_signal(sem, device_id=right,
                               device_id_type=_LOGICAL)
        pltpu.semaphore_wait(sem, 2)

    def halo_exchange(v, recv_l, recv_r, hrecv_l, hrecv_r):
        """Ring-send edge columns; returns (halo_left, halo_right) as
        (n, 1) values with the global chain ends masked to zero. Symmetric
        on every device, so the single-descriptor wait() pattern (send
        drained + own incoming arrived) balances."""
        send_r[...] = v[:, Kd - 1:Kd]   # my last column -> right nbr's left
        send_l[...] = v[:, 0:1]         # my first column -> left nbr's right
        cr = pltpu.make_async_remote_copy(
            src_ref=send_r, dst_ref=recv_l, send_sem=hsend_r,
            recv_sem=hrecv_l, device_id=right, device_id_type=_LOGICAL)
        cl = pltpu.make_async_remote_copy(
            src_ref=send_l, dst_ref=recv_r, send_sem=hsend_l,
            recv_sem=hrecv_r, device_id=left, device_id_type=_LOGICAL)
        cr.start()
        cl.start()
        cr.wait()
        cl.wait()
        halo_l = jnp.where(first, jnp.zeros((n, 1), v.dtype), recv_l[...])
        halo_r = jnp.where(last, jnp.zeros((n, 1), v.dtype), recv_r[...])
        return halo_l, halo_r

    def bdmv(M, v, halo_l, halo_r):
        """Local lane-major cbtd SpMV with RDMA halo columns at the shard
        edges (tpcg/ops/bdmv.py bdmv_lane_major with the chain boundary
        replaced by the received columns)."""
        v_dn = jnp.concatenate([halo_l, v[:, :-1]], axis=1)
        v_up = jnp.concatenate([v[:, 1:], halo_r], axis=1)
        return (jnp.sum(M[0] * v_dn[:, None, :], axis=0) +
                jnp.sum(M[1] * v[:, None, :], axis=0) +
                jnp.sum(M[2] * v_up[:, None, :], axis=0))

    def allreduce(partial, mb, mb_recv):
        """Mailbox all-reduce of a scalar partial (pcg.cuh:144-149 across
        chips): broadcast my partial into row `my` of every device's
        mailbox, wait for all D arrivals, reduce rows in fixed order.

        Callers MUST strictly alternate the two mailboxes (A, B, A, B...):
        a same-mailbox reuse is then two rounds apart with a full
        all-device round between, so no device can overwrite a slot
        another device has not consumed — for ANY D (with consecutive
        same-buffer rounds, a device two hops away could still be waiting
        on the previous round when a fast device's next-round write
        lands)."""
        part_buf[...] = jnp.full((1, 128), partial, part_buf.dtype)
        copies = []
        for k in range(D):  # static unroll; includes the local write
            c = pltpu.make_async_remote_copy(
                src_ref=part_buf, dst_ref=mb.at[pl.ds(my, 1), :],
                send_sem=mb_send, recv_sem=mb_recv,
                device_id=jnp.int32(k), device_id_type=_LOGICAL)
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()
        # 2D masked reduce (rank-1 vector values SIGABRT Mosaic; col 0
        # holds the payload, rows >= D are never written)
        mask = (jax.lax.broadcasted_iota(jnp.int32, (mb_rows, 128), 0)
                < jnp.int32(D)) & \
               (jax.lax.broadcasted_iota(jnp.int32, (mb_rows, 128), 1)
                == jnp.int32(0))
        return jnp.sum(jnp.where(mask, mb[...], 0.0))

    def allreduce2(pa, pb, mb, mb_recv):
        """Combined all-reduce of TWO scalar partials in one mailbox round
        (payload lanes 0 and 1) — the pipelined method's single sync point
        per iteration. Same alternation contract as :func:`allreduce`."""
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        part_buf[...] = jnp.where(lane == 0, pa,
                                  jnp.where(lane == 1, pb, 0.0))
        copies = []
        for k in range(D):
            c = pltpu.make_async_remote_copy(
                src_ref=part_buf, dst_ref=mb.at[pl.ds(my, 1), :],
                send_sem=mb_send, recv_sem=mb_recv,
                device_id=jnp.int32(k), device_id_type=_LOGICAL)
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()
        rowmask = (jax.lax.broadcasted_iota(jnp.int32, (mb_rows, 128), 0)
                   < jnp.int32(D))
        sums = jnp.sum(jnp.where(rowmask, mb[...], 0.0), axis=0,
                       keepdims=True)                       # (1, 128)
        return sums[0, 0], sums[0, 1]

    barrier()  # no remote DMA before every device finished setup

    S = S_ref[...]
    gamma = gamma_ref[...]
    lam0 = lam0_ref[...]
    tol = tol_ref[0]
    vdot = lambda a, b: jnp.sum(a * b)

    ex_A = lambda v: halo_exchange(v, recvA_l, recvA_r, hrecvA_l, hrecvA_r)
    ex_B = lambda v: halo_exchange(v, recvB_l, recvB_r, hrecvB_l, hrecvB_r)

    class _ExAlt:
        """Trace-time strict A/B alternation of the halo buffer sets.

        The reuse-safety invariant (module docstring) needs consecutive
        exchanges to use different buffers OR an intervening all-device
        round. Assigning buffers by alternation AT TRACE TIME keeps that
        true for every precond strategy, including the ones that elide
        apply-site exchanges entirely (identity / block_jacobi) — the
        remaining iteration-boundary same-buffer reuses are gated by the
        mailbox rounds every loop body contains. For precond='explicit'
        this reproduces the round-2 assignment exactly (init lam0[A],
        r[B], u[A]; loop w[B], m[A]; replacement x[B], r[A], u[B], p[A],
        s[B], q[A])."""

        def __init__(self):
            self._use_A = True

        def __call__(self, v):
            use_A = self._use_A
            self._use_A = not use_A
            return (ex_A if use_A else ex_B)(v)

    exx = _ExAlt()

    # --- preconditioner strategies (VERDICT r2 item 2: parity with the
    # single-chip kernel, which serves explicit/identity AND constructs
    # block_jacobi/symmetric_stair in-kernel) ---------------------------
    # * identity: no apply, no comm;
    # * explicit: cbtd bdmv with one halo exchange of v (the round-2 path);
    # * block_jacobi: Dinv built in-kernel (gj_inverse is pure-local —
    #   block-diagonal inversion needs no neighbor data), apply is local;
    # * symmetric_stair: Dinv in-kernel + the FACTORED apply
    #   (tpcg/ops/smallinv.py apply_symmetric_stair_factored) — only the
    #   intermediate w = Dinv v crosses shard edges, so each apply costs
    #   exactly one halo exchange, same comm count as explicit.
    # ``ex`` names the halo buffer set each call site may use; identity
    # and block_jacobi simply don't use it (their reuse safety comes from
    # the gating mailbox rounds between the remaining exchanges).
    if precond == "explicit":
        Pinv = pinv_ref[...]
    elif precond in ("block_jacobi", "symmetric_stair"):
        from tpcg.ops.smallinv import (blockdiag_mv_lane_major,
                                       gj_inverse_lane_major)
        Dinv_t = gj_inverse_lane_major(S[1], n, Kd, unroll=True)

    def apply_pinv(v, ex):
        if precond == "identity":
            return v
        if precond == "explicit":
            hl, hr = ex(v)
            return bdmv(Pinv, v, hl, hr)
        if precond == "block_jacobi":
            return blockdiag_mv_lane_major(Dinv_t, v, n, Kd)
        # symmetric_stair: chain-end zeros of the single-chip factored
        # apply become the RDMA halo columns (masked at the global ends)
        w = blockdiag_mv_lane_major(Dinv_t, v, n, Kd)
        hl, hr = ex(w)
        w_dn = jnp.concatenate([hl, w[:, :-1]], axis=1)
        w_up = jnp.concatenate([w[:, 1:], hr], axis=1)
        t = v - (jnp.sum(S[0] * w_dn[:, None, :], axis=0) +
                 jnp.sum(S[2] * w_up[:, None, :], axis=0))
        return blockdiag_mv_lane_major(Dinv_t, t, n, Kd)

    if method == "pipelined":
        # Ghysels-Vanroose recurrences (tpcg/solver/pipelined.py): both
        # dots at ONE mailbox round per iteration — over ICI, the sync
        # round is the expensive part, so this is where pipelining pays
        # most (the knot_sharded module's own argument, realized with
        # in-kernel RDMA). Halo order: init lam0[A], r[B], u[A]; per
        # iteration w[B], m[A]; replacement x[B], r[A], u[B], p[A], s[B],
        # q[A] — every same-buffer reuse has the consuming compute and a
        # gating round between (see allreduce's note).
        hl, hr = exx(lam0)
        r = gamma - bdmv(S, lam0, hl, hr)
        u = apply_pinv(r, exx)
        hl, hr = exx(u)
        w = bdmv(S, u, hl, hr)
        eta0, _ = allreduce2(vdot(r, u), jnp.zeros((), gamma.dtype),
                             mbA, mbA_recv)
        zeros = jnp.zeros_like(r)

        def pcond(c):
            return jnp.logical_and(c[10] < max_iter,
                                   jnp.logical_not(c[11]))

        def pbody(c):
            (x, r, u, w, z, q, s, p, eta_prev, alpha_prev, iters,
             _conv) = c
            ep = vdot(r, u)
            dp = vdot(w, u)
            # mailbox rounds alternate A (init), B, A, B ... — derived
            # from the iteration counter, identical on every device
            use_B = jax.lax.rem(iters, jnp.int32(2)) == 0
            eta, delta = jax.lax.cond(
                use_B,
                lambda _: allreduce2(ep, dp, mbB, mbB_recv),
                lambda _: allreduce2(ep, dp, mbA, mbA_recv),
                None)
            m = apply_pinv(w, exx)
            hl, hr = exx(m)
            nn = bdmv(S, m, hl, hr)
            frst = iters == 0
            beta = jnp.where(frst, jnp.zeros_like(eta), eta / eta_prev)
            alpha = jnp.where(frst, eta / delta,
                              eta / (delta - beta * eta / alpha_prev))
            z = nn + beta * z
            q = m + beta * q
            s = w + beta * s
            p = u + beta * p
            x = x + alpha * p
            r = r - alpha * s
            u = u - alpha * q
            w = w - alpha * z

            def replace(args):
                x, p, r, u, w, s, q, z = args
                hl, hr = exx(x)
                r = gamma - bdmv(S, x, hl, hr)
                u = apply_pinv(r, exx)
                hl, hr = exx(u)
                w = bdmv(S, u, hl, hr)
                hl, hr = exx(p)
                s = bdmv(S, p, hl, hr)
                q = apply_pinv(s, exx)
                hl, hr = exx(q)
                z = bdmv(S, q, hl, hr)
                return (x, p, r, u, w, s, q, z)

            # eta-guarded residual replacement (tpcg/solver/pipelined.py);
            # the decision derives from replicated eta/iters, so every
            # device takes the same branch — conditional communication
            # stays collective-safe. replace_every=0 compiles the cond
            # (and its halo rounds) out entirely — the zero-extra-sync
            # mode round 3 validated as exactly safe at K<=128.
            if replace_every:
                re32 = jnp.int32(replace_every)
                do_replace = jnp.logical_and(
                    jax.lax.rem(iters, re32) == re32 - 1, iters > 0)
                do_replace = jnp.logical_and(
                    do_replace, jnp.abs(eta) > 1000.0 * tol)
                x, p, r, u, w, s, q, z = jax.lax.cond(
                    do_replace, replace, lambda a: a,
                    (x, p, r, u, w, s, q, z))
            converged = jnp.abs(eta) < tol
            return (x, r, u, w, z, q, s, p, eta, alpha, iters + 1,
                    converged)

        init = (lam0, r, u, w, zeros, zeros, zeros, zeros, eta0,
                jnp.ones((), gamma.dtype), jnp.zeros((), jnp.int32),
                jnp.abs(eta0) < tol)
        out = jax.lax.while_loop(pcond, pbody, init)
        lam_ref[...] = out[0]
        iters_ref[0] = out[10]
        conv_ref[0] = out[11].astype(jnp.int32)
        eta_ref[0] = out[8]
        barrier()
        return

    # --- init (pcg.cuh:118-149): r, r_tilde, p, eta — halos by the
    # trace-time A/B alternation, eta through mailbox A ---
    hl, hr = exx(lam0)
    r = gamma - bdmv(S, lam0, hl, hr)
    rt = apply_pinv(r, exx)
    p = rt
    eta = allreduce(vdot(r, rt), mbA, mbA_recv)

    def cond(c):
        _lam, _r, _p, eta, iters, converged = c
        return jnp.logical_and(iters < max_iter,
                               jnp.logical_not(converged))

    def body(c):
        lam, r, p, eta, iters, _ = c
        # p's halo buffer is reusable — every device passed the previous
        # iteration's mailbox rounds, so its prior content is consumed
        hl, hr = exx(p)
        ups = bdmv(S, p, hl, hr)
        # mailbox rounds alternate A (init eta), B, A, B... — see
        # allreduce's reuse-safety note
        denom = allreduce(vdot(p, ups), mbB, mbB_recv)   # pcg.cuh:163-169
        alpha = eta / denom
        lam = lam + alpha * p                            # pcg.cuh:172-176
        r = r - alpha * ups
        rt = apply_pinv(r, exx)                          # pcg.cuh:181-184
        eta_new = allreduce(vdot(r, rt), mbA, mbA_recv)  # pcg.cuh:187-193
        converged = jnp.abs(eta_new) < tol               # pcg.cuh:195
        beta = eta_new / eta
        p = rt + beta * p
        return (lam, r, p, eta_new, iters + 1, converged)

    init = (lam0, r, p, eta, jnp.zeros((), jnp.int32), jnp.abs(eta) < tol)
    lam, r, p, eta, iters, converged = jax.lax.while_loop(cond, body, init)

    lam_ref[...] = lam
    iters_ref[0] = iters
    conv_ref[0] = converged.astype(jnp.int32)
    eta_ref[0] = eta

    barrier()  # no teardown while a neighbor's DMA may still read my bufs


def _kernel_nopinv(tol_ref, S_ref, gamma_ref, lam0_ref, *rest, **kw):
    """Signature without the Pinv operand (identity / in-kernel-build
    preconditioners) — same rationale as the fused kernel's nopinv shim
    (tpcg/ops/fused_pcg.py): a placeholder operand would DMA a full extra
    S into VMEM the kernel never reads."""
    _kernel(tol_ref, S_ref, None, gamma_ref, lam0_ref, *rest, **kw)


def pcg_rdma_sharded(S_blocks, Pinv_blocks, gamma, lam0, *, mesh,
                     axis_name: str = "knot", exit_tol, max_iter: int,
                     method: str = "classic", precond: str = None,
                     replace_every: int = 16,
                     interpret_params=None) -> PCGResult:
    """Knot-sharded PCG solve through the persistent RDMA kernel.

    Canonical layouts in: ``S_blocks``/``Pinv_blocks`` ``(K, 3, n, n)``,
    vectors ``(K, n)``; ``K`` must divide evenly over the mesh axis.

    ``precond``: ``None`` infers explicit/identity from ``Pinv_blocks``;
    ``"block_jacobi"`` / ``"symmetric_stair"`` CONSTRUCT Phi^-1 inside the
    kernel from S (``Pinv_blocks`` must be None) — feature parity with the
    single-chip fused kernel (the reference kernel is preconditioner-
    agnostic, pcg.cuh:56-57; its consumer builds Phi^-1 in separate
    kernels — here build + solve + communication is one persistent kernel
    per chip).

    ``interpret_params``: a ``pltpu.InterpretParams`` to run under the
    distributed TPU interpreter (required on CPU meshes; pass
    ``detect_races=True`` to run the happens-before race detector over
    the solve). Returns a replicated-scalars ``PCGResult``.
    """
    from tpcg.ops.bdmv import to_lane_major

    K, _, n, _ = S_blocks.shape
    D = int(np.prod([mesh.shape[a] for a in (axis_name,)]))
    if K % D != 0:
        raise ValueError(f"knot_points={K} must divide over the "
                         f"{D}-device '{axis_name}' mesh axis")
    if D > 128:
        raise ValueError("the mailbox holds one row per device and its "
                         "payload rides 128 lanes; meshes beyond 128 "
                         "devices need a hierarchical reduce")
    if precond is None:
        precond = "identity" if Pinv_blocks is None else "explicit"
    if precond != "explicit" and Pinv_blocks is not None:
        raise ValueError(f"Pinv_blocks must be None with precond="
                         f"{precond!r}")
    if precond not in ("explicit", "identity", "block_jacobi",
                       "symmetric_stair"):
        raise ValueError(f"bad precond {precond!r} (banded stair_refined "
                         "pages are single-chip only for now)")
    if precond == "explicit" and Pinv_blocks.shape[-3] != 3:
        raise ValueError("the RDMA kernel's explicit path is cbtd-only "
                         "(radius-1 halos); banded stair_refined Pinv is "
                         "single-chip only for now")
    if method not in ("classic", "pipelined"):
        raise ValueError(f"method must be 'classic' or 'pipelined', got "
                         f"{method!r}")
    Kd = K // D
    mb_rows = max(8, -(-D // 8) * 8)  # sublane-tile-aligned, >= D rows
    dtype = S_blocks.dtype
    tol = jnp.asarray([exit_tol], dtype)

    kern_fn = _kernel if precond == "explicit" else _kernel_nopinv
    kern = functools.partial(kern_fn, n=n, Kd=Kd, D=D, max_iter=max_iter,
                             axis_name=axis_name, method=method,
                             precond=precond, mb_rows=mb_rows,
                             replace_every=replace_every)

    def per_device(S_sh, P_sh, g_sh, l_sh):
        S_lm = to_lane_major(S_sh)          # (3, n, n, Kd)
        g_lm = jnp.swapaxes(g_sh, -1, -2)   # (n, Kd)
        l_lm = jnp.swapaxes(l_sh, -1, -2)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        col = pltpu.VMEM((n, 1), dtype)
        if P_sh is None:
            in_specs = [smem, vmem, vmem, vmem]
            operands = (tol, S_lm, g_lm, l_lm)
        else:
            in_specs = [smem, vmem, vmem, vmem, vmem]
            operands = (tol, S_lm, to_lane_major(P_sh), g_lm, l_lm)
        lam_lm, iters, conv, eta = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((n, Kd), dtype),
                jax.ShapeDtypeStruct((1,), jnp.int32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
                jax.ShapeDtypeStruct((1,), dtype),
            ),
            in_specs=in_specs,
            out_specs=(vmem, smem, smem, smem),
            scratch_shapes=[
                col, col,                      # send_l, send_r
                col, col, col, col,            # recvA/B halo buffers
                pltpu.VMEM((mb_rows, 128), dtype),   # mailbox A
                pltpu.VMEM((mb_rows, 128), dtype),   # mailbox B
                pltpu.VMEM((1, 128), dtype),   # partial broadcast buffer
                pltpu.SemaphoreType.DMA,       # hsend_l
                pltpu.SemaphoreType.DMA,       # hsend_r
                pltpu.SemaphoreType.DMA,       # hrecvA_l
                pltpu.SemaphoreType.DMA,       # hrecvA_r
                pltpu.SemaphoreType.DMA,       # hrecvB_l
                pltpu.SemaphoreType.DMA,       # hrecvB_r
                pltpu.SemaphoreType.DMA,       # mb_send
                pltpu.SemaphoreType.DMA,       # mbA_recv
                pltpu.SemaphoreType.DMA,       # mbB_recv
            ],
            compiler_params=pltpu.CompilerParams(collective_id=0),
            interpret=(interpret_params if interpret_params is not None
                       else False),
        )(*operands)
        return jnp.swapaxes(lam_lm, -1, -2), iters, conv, eta

    if Pinv_blocks is None:
        shard = jax.shard_map(
            lambda S_sh, g_sh, l_sh: per_device(S_sh, None, g_sh, l_sh),
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P(axis_name)),
            out_specs=(P(axis_name), P(), P(), P()),
            check_vma=False)
        lam, iters, conv, eta = shard(S_blocks, gamma, lam0)
    else:
        shard = jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P(axis_name),
                      P(axis_name)),
            out_specs=(P(axis_name), P(), P(), P()),
            check_vma=False)
        lam, iters, conv, eta = shard(S_blocks, Pinv_blocks, gamma, lam0)
    return PCGResult(lam=lam, iters=iters[0], converged=conv[0] != 0,
                     eta=eta[0])


# ---------------------------------------------------------------------------
# Fleet form: B systems x K knots, knot axis sharded, lane-packed locally
# ---------------------------------------------------------------------------

def _fleet_kernel(tol_ref, S_ref, pinv_ref, gamma_ref, lam0_ref,
                  lam_ref, iters_ref, conv_ref, eta_ref,
                  send_l, send_r, recvA_l, recvA_r, recvB_l, recvB_r,
                  mbA, mbB, part_buf, part2_buf,
                  hsend_l, hsend_r, hrecvA_l, hrecvA_r, hrecvB_l, hrecvB_r,
                  mb_send, mbA_recv, mbB_recv,
                  *, n, Kd, B, D, L, max_iter, axis_name,
                  method="classic", precond="explicit", mb_rows=8,
                  stop_on_nonfinite=False, replace_every=16):
    """Fleet (batch x knot) persistent RDMA kernel.

    Local layout is the lane-packed form of tpcg/ops/packed.py: B systems'
    local shards abutted on lanes — S ``(3, n, n, L)``, vectors
    ``(n, L)`` with ``L = B * Kd`` and period-``Kd`` segments. Three
    differences from the single-system kernel above:

    * halo exchange ships the WHOLE (n, L) page to each neighbor (the
      per-segment edge columns live at strided lanes; a strided gather is
      hostile to Mosaic, and the extra bytes are noise next to ICI
      latency), and the received page is aligned onto segment starts/ends
      with masked rolls;
    * the mailbox payload is the full (1, L) lane vector of per-segment
      partial sums (replicated within each segment by the local log-shift
      all-reduce), so the cross-device reduce yields per-SYSTEM scalars
      with no transposes — alpha/beta/eta stay lane-replicated values,
      exactly like the packed kernel;
    * the loop carries the packed freeze-mask discipline
      (tpcg/ops/packed.py _packed_classic_loop): per-system done/conv
      masks, optional nonfinite guard — and because every mask derives
      from all-reduced etas, every device computes identical masks and
      the while predicate cannot diverge (the collective-deadlock
      invariant).
    """
    from tpcg.ops.packed import (_seg_allreduce, _seg_shift_down,
                                 _seg_shift_up)
    from tpcg.ops.smallinv import (blockdiag_mv_lane_major,
                                   gj_inverse_lane_major)

    my = jax.lax.axis_index(axis_name)
    left = jax.lax.rem(my - 1 + D, jnp.int32(D))
    right = jax.lax.rem(my + 1, jnp.int32(D))
    first = my == 0
    last = my == D - 1

    def barrier():
        sem = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(sem, device_id=left, device_id_type=_LOGICAL)
        pltpu.semaphore_signal(sem, device_id=right,
                               device_id_type=_LOGICAL)
        pltpu.semaphore_wait(sem, 2)

    def halo_exchange(v, recv_l, recv_r, hrecv_l, hrecv_r):
        send_r[...] = v
        send_l[...] = v
        cr = pltpu.make_async_remote_copy(
            src_ref=send_r, dst_ref=recv_l, send_sem=hsend_r,
            recv_sem=hrecv_l, device_id=right, device_id_type=_LOGICAL)
        cl = pltpu.make_async_remote_copy(
            src_ref=send_l, dst_ref=recv_r, send_sem=hsend_l,
            recv_sem=hrecv_r, device_id=left, device_id_type=_LOGICAL)
        cr.start()
        cl.start()
        cr.wait()
        cl.wait()
        return recv_l[...], recv_r[...]

    lane = jax.lax.broadcasted_iota(jnp.int32, (n, L), 1)
    lmod = lane % jnp.int32(Kd)

    def shifts_with_halos(v, pg_l, pg_r):
        """Period-Kd down/up shifts with the cross-device columns patched
        in: segment-start lanes take the LEFT neighbor's segment-end value
        (its lane l+Kd-1, aligned here by a -(Kd-1) roll), segment-end
        lanes the RIGHT neighbor's segment-start value; the global chain
        ends stay zero."""
        v_dn = _seg_shift_down(v, n, L, Kd)
        v_up = _seg_shift_up(v, n, L, Kd)
        if Kd > 1:
            hl = jnp.roll(pg_l, -(Kd - 1), axis=1)
            hr = jnp.roll(pg_r, Kd - 1, axis=1)
        else:
            hl, hr = pg_l, pg_r
        take_l = jnp.logical_and(lmod == jnp.int32(0),
                                 jnp.logical_not(first))
        take_r = jnp.logical_and(lmod == jnp.int32(Kd - 1),
                                 jnp.logical_not(last))
        v_dn = jnp.where(take_l, hl, v_dn)
        v_up = jnp.where(take_r, hr, v_up)
        return v_dn, v_up

    barrier()

    S = S_ref[...]
    gamma = gamma_ref[...]
    lam0 = lam0_ref[...]
    tol = tol_ref[0]

    ex_A = lambda v: halo_exchange(v, recvA_l, recvA_r, hrecvA_l, hrecvA_r)
    ex_B = lambda v: halo_exchange(v, recvB_l, recvB_r, hrecvB_l, hrecvB_r)

    class _ExAlt:
        def __init__(self):
            self._use_A = True

        def __call__(self, v):
            use_A = self._use_A
            self._use_A = not use_A
            return (ex_A if use_A else ex_B)(v)

    exx = _ExAlt()

    def bdmv(M, v_dn, v, v_up):
        return (jnp.sum(M[0] * v_dn[:, None, :], axis=0) +
                jnp.sum(M[1] * v[:, None, :], axis=0) +
                jnp.sum(M[2] * v_up[:, None, :], axis=0))

    def mv(v, ex):
        pg_l, pg_r = ex(v)
        return bdmv(S, *_mid(shifts_with_halos(v, pg_l, pg_r), v))

    def _mid(dnup, v):
        return (dnup[0], v, dnup[1])

    if precond == "explicit":
        Pinv = pinv_ref[...]
    elif precond in ("block_jacobi", "symmetric_stair"):
        Dinv_t = gj_inverse_lane_major(S[1], n, L, unroll=True)

    def apply_pinv(v, ex):
        if precond == "identity":
            return v
        if precond == "explicit":
            pg_l, pg_r = ex(v)
            return bdmv(Pinv, *_mid(shifts_with_halos(v, pg_l, pg_r), v))
        if precond == "block_jacobi":
            return blockdiag_mv_lane_major(Dinv_t, v, n, L)
        w = blockdiag_mv_lane_major(Dinv_t, v, n, L)
        pg_l, pg_r = ex(w)
        w_dn, w_up = shifts_with_halos(w, pg_l, pg_r)
        t = v - (jnp.sum(S[0] * w_dn[:, None, :], axis=0) +
                 jnp.sum(S[2] * w_up[:, None, :], axis=0))
        return blockdiag_mv_lane_major(Dinv_t, t, n, L)

    def allreduce(t, mb, mb_recv):
        """Cross-device sum of a (1, L) lane vector of per-segment local
        partials: every device posts its row, waits for all D arrivals,
        reduces rows in fixed order — per-system sums land replicated on
        every lane of their segment, on every device."""
        part_buf[...] = jnp.broadcast_to(t, part_buf.shape)
        copies = []
        for k in range(D):
            c = pltpu.make_async_remote_copy(
                src_ref=part_buf, dst_ref=mb.at[pl.ds(my, 1), :],
                send_sem=mb_send, recv_sem=mb_recv,
                device_id=jnp.int32(k), device_id_type=_LOGICAL)
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()
        rowmask = (jax.lax.broadcasted_iota(jnp.int32, (mb_rows, L), 0)
                   < jnp.int32(D))
        return jnp.sum(jnp.where(rowmask, mb[...], 0.0), axis=0,
                       keepdims=True)

    def allreduce2(ta, tb, mb, mb_recv):
        """Combined all-reduce of TWO (1, L) partial rows in ONE mailbox
        round — the fleet analog of the single-system kernel's two-scalar
        payload (lanes 0/1 there, a TWO-ROW payload here: the per-system
        lanes already fill the lane dim). Device k posts rows
        [2k, 2k+1]; even rows sum to the first result, odd rows to the
        second. Same A/B alternation contract as :func:`allreduce`; needs
        ``mb_rows >= 2 D`` (sized by the caller for pipelined)."""
        part2_buf[...] = jnp.concatenate(
            [jnp.broadcast_to(ta, (1, L)), jnp.broadcast_to(tb, (1, L))],
            axis=0)
        copies = []
        for k in range(D):
            c = pltpu.make_async_remote_copy(
                src_ref=part2_buf, dst_ref=mb.at[pl.ds(2 * my, 2), :],
                send_sem=mb_send, recv_sem=mb_recv,
                device_id=jnp.int32(k), device_id_type=_LOGICAL)
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()
        row = jax.lax.broadcasted_iota(jnp.int32, (mb_rows, L), 0)
        valid = row < jnp.int32(2 * D)
        even = jnp.logical_and(valid,
                               jax.lax.rem(row, jnp.int32(2))
                               == jnp.int32(0))
        odd = jnp.logical_and(valid,
                              jax.lax.rem(row, jnp.int32(2))
                              == jnp.int32(1))
        sa = jnp.sum(jnp.where(even, mb[...], 0.0), axis=0, keepdims=True)
        sb = jnp.sum(jnp.where(odd, mb[...], 0.0), axis=0, keepdims=True)
        return sa, sb

    def vdot_local(a, b):
        from tpcg.ops.packed import _seg_allreduce
        t = jnp.sum(a * b, axis=0, keepdims=True)
        return _seg_allreduce(t, L, Kd)

    if method not in ("classic", "pipelined"):
        raise ValueError(f"bad fleet method {method!r}")

    # --- init ---
    r = gamma - mv(lam0, exx)
    if method == "pipelined":
        u = apply_pinv(r, exx)
        w = mv(u, exx)
        eta = allreduce(vdot_local(r, u), mbA, mbA_recv)
    else:
        rt = apply_pinv(r, exx)
        p = rt
        eta = allreduce(vdot_local(r, rt), mbA, mbA_recv)

    conv0 = (jnp.abs(eta) < tol).astype(jnp.int32)
    done0 = conv0
    if stop_on_nonfinite:
        done0 = jnp.maximum(
            done0, jnp.logical_not(jnp.isfinite(eta)).astype(jnp.int32))

    if method == "pipelined":
        zeros = jnp.zeros_like(r)

        def pcond(c):
            return jnp.logical_and(c[-1] < max_iter,
                                   jnp.min(c[-2]) < jnp.int32(1))

        def pbody(c):
            (x, r, u, w, z, q, s, p, eta_prev, alpha_prev, iters, conv32,
             done32, step) = c
            active = done32 == jnp.int32(0)
            ep = vdot_local(r, u)
            dp = vdot_local(w, u)
            # ONE two-row mailbox round per iteration (allreduce2) — the
            # single sync point that is the pipelined method's whole value
            # over ICI. Rounds alternate A (init), B, A, B ... by step
            # parity, identical on every device.
            use_B = jax.lax.rem(step, jnp.int32(2)) == 0
            eta, delta = jax.lax.cond(
                use_B,
                lambda _: allreduce2(ep, dp, mbB, mbB_recv),
                lambda _: allreduce2(ep, dp, mbA, mbA_recv),
                None)
            eta = jnp.where(active, eta, eta_prev)
            m = apply_pinv(w, exx)
            nn = mv(m, exx)
            frst = step == 0
            beta = jnp.where(frst, jnp.zeros_like(eta), eta / eta_prev)
            alpha = jnp.where(frst, eta / delta,
                              eta / (delta - beta * eta / alpha_prev))
            z = jnp.where(active, nn + beta * z, z)
            q = jnp.where(active, m + beta * q, q)
            s = jnp.where(active, w + beta * s, s)
            p = jnp.where(active, u + beta * p, p)
            x = jnp.where(active, x + alpha * p, x)
            r = jnp.where(active, r - alpha * s, r)
            u = jnp.where(active, u - alpha * q, u)
            w = jnp.where(active, w - alpha * z, w)
            # eta-guarded PER-SYSTEM residual replacement (cadence +
            # guard of tpcg/ops/packed.py's fleet loop; the single-system
            # kernel above has the scalar form). Collective safety: eta
            # is mailbox-all-reduced so `need`/`do_replace` are identical
            # on every device and the halo exchanges inside the cond stay
            # matched — same discipline as the single-system replace.
            need = jnp.logical_and(active, jnp.abs(eta) > 1000.0 * tol)

            def replace(args):
                x, p, r0, u0, w0, s0, q0, z0 = args
                r_n = gamma - mv(x, exx)
                u_n = apply_pinv(r_n, exx)
                w_n = mv(u_n, exx)
                s_n = mv(p, exx)
                q_n = apply_pinv(s_n, exx)
                z_n = mv(q_n, exx)
                blend = lambda newv, oldv: jnp.where(need, newv, oldv)
                return (x, p, blend(r_n, r0), blend(u_n, u0),
                        blend(w_n, w0), blend(s_n, s0), blend(q_n, q0),
                        blend(z_n, z0))

            # replace_every=0 compiles the replacement (and its halo
            # rounds) out entirely — matches the packed/pipelined API
            if replace_every:
                re32 = jnp.int32(replace_every)
                do_replace = jnp.logical_and(
                    jax.lax.rem(step, re32) == re32 - jnp.int32(1),
                    step > jnp.int32(0))
                any_need = jnp.max(need.astype(jnp.int32)) == jnp.int32(1)
                do_replace = jnp.logical_and(do_replace, any_need)
                x, p, r, u, w, s, q, z = jax.lax.cond(
                    do_replace, replace, lambda a: a,
                    (x, p, r, u, w, s, q, z))
            conv_new = jnp.logical_and(active, jnp.abs(eta) < tol)
            conv32 = jnp.maximum(conv32, conv_new.astype(jnp.int32))
            done32 = jnp.maximum(done32, conv32)
            if stop_on_nonfinite:
                bad = jnp.logical_and(
                    active, jnp.logical_not(jnp.isfinite(eta)))
                done32 = jnp.maximum(done32, bad.astype(jnp.int32))
            alpha_prev = jnp.where(active, alpha, alpha_prev)
            iters = iters + active.astype(jnp.int32)
            return (x, r, u, w, z, q, s, p, eta, alpha_prev, iters,
                    conv32, done32, step + 1)

        init = (lam0, r, u, w, zeros, zeros, zeros, zeros, eta,
                jnp.ones_like(eta), jnp.zeros((1, L), jnp.int32), conv0,
                done0, jnp.zeros((), jnp.int32))
        out = jax.lax.while_loop(pcond, pbody, init)
        lam, eta_v, iters_v, conv_v = out[0], out[8], out[10], out[11]
    else:
        def cond(c):
            return jnp.logical_and(c[-1] < max_iter,
                                   jnp.min(c[-2]) < jnp.int32(1))

        def body(c):
            lam, r, p, eta, iters, conv32, done32, step = c
            active = done32 == jnp.int32(0)
            ups = mv(p, exx)
            denom = allreduce(vdot_local(p, ups), mbB, mbB_recv)
            alpha = eta / denom
            lam = jnp.where(active, lam + alpha * p, lam)
            r = jnp.where(active, r - alpha * ups, r)
            rt = apply_pinv(r, exx)
            eta_new = jnp.where(
                active, allreduce(vdot_local(r, rt), mbA, mbA_recv), eta)
            conv_new = jnp.logical_and(active, jnp.abs(eta_new) < tol)
            beta = eta_new / eta
            p = jnp.where(active, rt + beta * p, p)
            iters = iters + active.astype(jnp.int32)
            conv32 = jnp.maximum(conv32, conv_new.astype(jnp.int32))
            done32 = jnp.maximum(done32, conv32)
            if stop_on_nonfinite:
                bad = jnp.logical_and(
                    active, jnp.logical_not(jnp.isfinite(eta_new)))
                done32 = jnp.maximum(done32, bad.astype(jnp.int32))
            return (lam, r, p, eta_new, iters, conv32, done32, step + 1)

        init = (lam0, r, p, eta, jnp.zeros((1, L), jnp.int32), conv0,
                done0, jnp.zeros((), jnp.int32))
        out = jax.lax.while_loop(cond, body, init)
        lam, eta_v, iters_v, conv_v = out[0], out[3], out[4], out[5]

    lam_ref[...] = lam
    for b in range(B):
        idx = jnp.int32(b)
        iters_ref[idx] = iters_v[0, b * Kd]
        conv_ref[idx] = conv_v[0, b * Kd]
        eta_ref[idx] = eta_v[0, b * Kd]

    barrier()


def _fleet_kernel_nopinv(tol_ref, S_ref, gamma_ref, lam0_ref, *rest, **kw):
    _fleet_kernel(tol_ref, S_ref, None, gamma_ref, lam0_ref, *rest, **kw)


def pcg_rdma_sharded_batched(S_blocks, Pinv_blocks, gamma, lam0, *, mesh,
                             axis_name: str = "knot", exit_tol,
                             max_iter: int, method: str = "classic",
                             precond: str = None,
                             stop_on_nonfinite: bool = False,
                             replace_every: int = 16,
                             interpret_params=None) -> PCGResult:
    """Fleet (batch x knot) solve through the persistent RDMA kernel:
    ``S_blocks (B, K, 3, n, n)``, vectors ``(B, K, n)``, knot axis sharded
    over the mesh. Per-system iteration semantics match independent solves
    (frozen after convergence; optional ``stop_on_nonfinite`` freeze), and
    every device executes one identical persistent kernel for the whole
    fleet — the batched completion of the reference's cooperative-kernel
    architecture that its one-launch-per-system design could not express
    (SURVEY.md §2 "parallelism strategies: batched solve absent").
    """
    from tpcg.ops.bdmv import to_lane_major

    B, K, _, n, _ = S_blocks.shape
    D = int(np.prod([mesh.shape[a] for a in (axis_name,)]))
    if K % D != 0:
        raise ValueError(f"knot_points={K} must divide over the "
                         f"{D}-device '{axis_name}' mesh axis")
    if D > 128:
        raise ValueError("one mailbox row per device: > 128 devices needs "
                         "a hierarchical reduce")
    if precond is None:
        precond = "identity" if Pinv_blocks is None else "explicit"
    if precond != "explicit" and Pinv_blocks is not None:
        raise ValueError(f"Pinv_blocks must be None with precond="
                         f"{precond!r}")
    if precond == "explicit" and Pinv_blocks.shape[-3] != 3:
        raise ValueError("fleet RDMA explicit path is cbtd-only")
    if method not in ("classic", "pipelined"):
        raise ValueError(f"method must be 'classic' or 'pipelined', got "
                         f"{method!r}")
    Kd = K // D
    L = B * Kd
    # pipelined posts a TWO-ROW payload per device (combined eta/delta
    # round — allreduce2); classic posts one row per device
    mb_rows = max(8, -(-(2 * D if method == "pipelined" else D) // 8) * 8)
    dtype = S_blocks.dtype
    tol = jnp.asarray([exit_tol], dtype)

    kern_fn = _fleet_kernel if precond == "explicit" else \
        _fleet_kernel_nopinv
    kern = functools.partial(kern_fn, n=n, Kd=Kd, B=B, D=D, L=L,
                             max_iter=max_iter, axis_name=axis_name,
                             method=method, precond=precond,
                             mb_rows=mb_rows,
                             stop_on_nonfinite=stop_on_nonfinite,
                             replace_every=replace_every)

    def pack_mats(blocks_sh):   # (B, Kd, 3, n, n) -> (3, n, n, B*Kd)
        lm = jax.vmap(to_lane_major)(blocks_sh)      # (B, 3, n, n, Kd)
        return jnp.moveaxis(lm, 0, -2).reshape(3, n, n, L)

    def pack_vecs(v_sh):        # (B, Kd, n) -> (n, B*Kd)
        v = jnp.swapaxes(v_sh, -1, -2)               # (B, n, Kd)
        return jnp.moveaxis(v, 0, -2).reshape(n, L)

    def per_device(S_sh, P_sh, g_sh, l_sh):
        S_lm = pack_mats(S_sh)
        g_lm = pack_vecs(g_sh)
        l_lm = pack_vecs(l_sh)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        page = pltpu.VMEM((n, L), dtype)
        if P_sh is None:
            in_specs = [smem, vmem, vmem, vmem]
            operands = (tol, S_lm, g_lm, l_lm)
        else:
            in_specs = [smem, vmem, vmem, vmem, vmem]
            operands = (tol, S_lm, pack_mats(P_sh), g_lm, l_lm)
        lam_lm, iters, conv, eta = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((n, L), dtype),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), dtype),
            ),
            in_specs=in_specs,
            out_specs=(vmem, smem, smem, smem),
            scratch_shapes=[
                page, page,                    # send_l, send_r
                page, page, page, page,        # recvA/B full-page halos
                pltpu.VMEM((mb_rows, L), dtype),   # mailbox A
                pltpu.VMEM((mb_rows, L), dtype),   # mailbox B
                pltpu.VMEM((1, L), dtype),     # partial broadcast buffer
                pltpu.VMEM((2, L), dtype),     # two-row payload (pipelined)
                pltpu.SemaphoreType.DMA,       # hsend_l
                pltpu.SemaphoreType.DMA,       # hsend_r
                pltpu.SemaphoreType.DMA,       # hrecvA_l
                pltpu.SemaphoreType.DMA,       # hrecvA_r
                pltpu.SemaphoreType.DMA,       # hrecvB_l
                pltpu.SemaphoreType.DMA,       # hrecvB_r
                pltpu.SemaphoreType.DMA,       # mb_send
                pltpu.SemaphoreType.DMA,       # mbA_recv
                pltpu.SemaphoreType.DMA,       # mbB_recv
            ],
            compiler_params=pltpu.CompilerParams(collective_id=0),
            interpret=(interpret_params if interpret_params is not None
                       else False),
        )(*operands)
        # (n, B*Kd) -> (B, Kd, n)
        lam = jnp.moveaxis(lam_lm.reshape(n, B, Kd), 1, 0)
        return jnp.swapaxes(lam, -1, -2), iters, conv, eta

    in_knot = P(None, axis_name)
    if Pinv_blocks is None:
        shard = jax.shard_map(
            lambda S_sh, g_sh, l_sh: per_device(S_sh, None, g_sh, l_sh),
            mesh=mesh,
            in_specs=(in_knot, in_knot, in_knot),
            out_specs=(in_knot, P(), P(), P()),
            check_vma=False)
        lam, iters, conv, eta = shard(S_blocks, gamma, lam0)
    else:
        shard = jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(in_knot, in_knot, in_knot, in_knot),
            out_specs=(in_knot, P(), P(), P()),
            check_vma=False)
        lam, iters, conv, eta = shard(S_blocks, Pinv_blocks, gamma, lam0)
    return PCGResult(lam=lam, iters=iters, converged=conv != 0, eta=eta)
