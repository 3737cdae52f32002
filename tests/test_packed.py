"""Lane-packed multi-system kernel (tpcg/ops/packed.py) vs per-system
oracles, in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpcg import BlockTridiag, layout, precond
from tpcg.ops.packed import pack_width, pcg_pallas_packed
from tpcg.solver import jnp_backend
from tpcg.solver.pipelined import pcg_pipelined_jnp


def _batch(B, n, K, seed=0, dtype=jnp.float32):
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    blocks = jnp.stack([layout.random_spd_cbtd(k, n, K, dtype=dtype).blocks
                        for k in keys])
    gamma = jax.random.normal(jax.random.PRNGKey(seed + 100), (B, K, n),
                              dtype)
    return blocks, gamma


@pytest.mark.parametrize("pre", ["identity", "block_jacobi",
                                 "symmetric_stair"])
@pytest.mark.parametrize("P,K", [(4, 8), (2, 16)])
def test_packed_classic_matches_per_system(pre, P, K):
    B, n = P, 5  # single pack instance
    blocks, gamma = _batch(B, n, K, seed=P + K)
    lam0 = jnp.zeros_like(gamma)
    res = pcg_pallas_packed(blocks, None, gamma, lam0, exit_tol=1e-8,
                            max_iter=300, precond=pre, P=P, interpret=True)
    identity = pre == "identity"
    for b in range(B):
        pb = (blocks[b] if identity
              else precond.build(BlockTridiag(blocks[b]), pre).blocks)
        r1 = jnp_backend.pcg_jnp(blocks[b], pb, gamma[b], lam0[b],
                                 exit_tol=1e-8, max_iter=300,
                                 identity_pinv=identity)
        assert bool(res.converged[b])
        # +-2, not the usual +-1: the segment-matmul dot sums lanes in a
        # different order than jnp.sum, and at tol=1e-8 f32 (near the eta
        # noise floor for identity preconditioning) that flips the exit by
        # up to 2 passes
        assert abs(int(res.iters[b]) - int(r1.iters)) <= 2, f"system {b}"
        np.testing.assert_allclose(np.asarray(res.lam[b]),
                                   np.asarray(r1.lam), rtol=2e-4, atol=2e-5)


def test_packed_multiple_grid_steps():
    P, K, n, B = 2, 8, 4, 6  # 3 grid steps of 2-packs
    blocks, gamma = _batch(B, n, K, seed=3)
    lam0 = jnp.zeros_like(gamma)
    res = pcg_pallas_packed(blocks, None, gamma, lam0, exit_tol=1e-7,
                            max_iter=200, precond="block_jacobi", P=P,
                            interpret=True)
    assert res.lam.shape == (B, K, n)
    assert np.all(np.asarray(res.converged))
    for b in range(B):
        x = np.linalg.solve(
            np.asarray(BlockTridiag(blocks[b]).dense(), np.float64),
            np.asarray(gamma[b], np.float64).reshape(-1))
        np.testing.assert_allclose(np.asarray(res.lam[b]).reshape(-1), x,
                                   rtol=1e-3, atol=1e-3)


def test_packed_explicit_pinv():
    P, K, n = 2, 8, 4
    blocks, gamma = _batch(P, n, K, seed=5)
    lam0 = jnp.zeros_like(gamma)
    pb = precond.build(BlockTridiag(blocks), "block_jacobi").blocks
    res = pcg_pallas_packed(blocks, pb, gamma, lam0, exit_tol=1e-7,
                            max_iter=200, P=P, interpret=True)
    for b in range(P):
        r1 = jnp_backend.pcg_jnp(blocks[b], pb[b], gamma[b], lam0[b],
                                 exit_tol=1e-7, max_iter=200)
        assert abs(int(res.iters[b]) - int(r1.iters)) <= 1
        np.testing.assert_allclose(np.asarray(res.lam[b]),
                                   np.asarray(r1.lam), rtol=2e-4, atol=2e-5)


def test_packed_pipelined_matches_oracle():
    P, K, n = 2, 8, 4
    blocks, gamma = _batch(P, n, K, seed=7)
    lam0 = jnp.zeros_like(gamma)
    res = pcg_pallas_packed(blocks, None, gamma, lam0, exit_tol=1e-7,
                            max_iter=200, precond="block_jacobi",
                            method="pipelined", P=P, interpret=True)
    for b in range(P):
        pb = precond.build(BlockTridiag(blocks[b]), "block_jacobi").blocks
        r1 = pcg_pipelined_jnp(blocks[b], pb, gamma[b], lam0[b],
                               exit_tol=1e-7, max_iter=200)
        assert bool(res.converged[b])
        assert abs(int(res.iters[b]) - int(r1.iters)) <= 1
        np.testing.assert_allclose(np.asarray(res.lam[b]),
                                   np.asarray(r1.lam), rtol=2e-4, atol=2e-5)


def test_packed_lean_matches_fast():
    """The lean (slice-at-use) packed variant must be numerically identical
    in routing-relevant outputs to the fast one."""
    P, K, n = 2, 16, 5
    blocks, gamma = _batch(P, n, K, seed=21)
    lam0 = jnp.zeros_like(gamma)
    kw = dict(exit_tol=1e-7, max_iter=200, precond="symmetric_stair", P=P,
              interpret=True)
    fast = pcg_pallas_packed(blocks, None, gamma, lam0, lean=False, **kw)
    lean = pcg_pallas_packed(blocks, None, gamma, lam0, lean=True, **kw)
    for b in range(P):
        assert bool(lean.converged[b])
        assert abs(int(lean.iters[b]) - int(fast.iters[b])) <= 1
        np.testing.assert_allclose(np.asarray(lean.lam[b]),
                                   np.asarray(fast.lam[b]),
                                   rtol=2e-4, atol=2e-5)


def test_packed_mixed_convergence_freezes():
    """System 0 converged at entry (zero rhs): must come back lam=0,
    iters=0, no NaN; others solve normally."""
    P, K, n = 2, 8, 4
    blocks, gamma = _batch(P, n, K, seed=9)
    gamma = gamma.at[0].set(0.0)
    lam0 = jnp.zeros_like(gamma)
    res = pcg_pallas_packed(blocks, None, gamma, lam0, exit_tol=1e-7,
                            max_iter=200, precond="block_jacobi", P=P,
                            interpret=True)
    assert np.all(np.isfinite(np.asarray(res.lam)))
    assert np.all(np.asarray(res.lam[0]) == 0)
    assert int(res.iters[0]) == 0
    assert bool(res.converged[0]) and bool(res.converged[1])


def test_pack_width_heuristic():
    # cap is the VMEM model (the log-shift dot has no segment matrix) with
    # the fast variant preferred: at n=14 explicit-Pinv, PK=512 is the
    # widest fast fit (PK=1024 fits only lean, which measured slower)
    assert pack_width(256, 128, 14) == 4
    assert pack_width(256, 32, 14) == 16
    assert pack_width(3, 128, 14) == 1              # must divide B
    assert pack_width(256, 512, 14) == 1
    # lighter preconditioner -> wider fast fit: block_jacobi at PK=1024
    assert pack_width(256, 128, 14, precond="block_jacobi") == 8
    # max_lanes escape hatch still caps
    assert pack_width(256, 32, 14, max_lanes=128) == 4


def test_seg_allreduce_matches_numpy():
    """The log-shift segmented all-reduce (any K, incl. non-powers of two)
    vs numpy segment sums."""
    from tpcg.ops.packed import _seg_allreduce

    rng = np.random.RandomState(0)
    for PK, K in [(128, 128), (256, 128), (512, 32), (384, 96), (12, 3),
                  (10, 5), (7, 7), (6, 1)]:
        t = jnp.asarray(rng.randn(2, PK).astype(np.float32))
        got = np.asarray(_seg_allreduce(t, PK, K))
        tn = np.asarray(t)
        want = tn.reshape(2, PK // K, K).sum(-1, keepdims=True)
        want = np.repeat(want, K, -1).reshape(2, PK)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"PK={PK} K={K}")


def test_packed_rejects_bad_pack():
    blocks, gamma = _batch(3, 4, 8)
    with pytest.raises(ValueError, match="divisible"):
        pcg_pallas_packed(blocks, None, gamma, jnp.zeros_like(gamma),
                          exit_tol=1e-6, max_iter=10, P=2, interpret=True)


def test_batched_backend_routes_small_K_through_pack():
    """pcg_pallas_batched at K<128 (the grid kernel cannot block-slice
    unaligned lanes) must route through the packed kernel with identity
    padding and return exact per-system results."""
    from tpcg.solver import pallas_backend

    B, n, K = 6, 4, 12  # B not a power of 2, K unaligned -> pads both
    blocks, gamma = _batch(B, n, K, seed=11)
    lam0 = jnp.zeros_like(gamma)
    res = pallas_backend.pcg_pallas_batched(
        blocks, None, gamma, lam0, exit_tol=1e-7, max_iter=200,
        precond="block_jacobi", interpret=True)
    assert res.lam.shape == (B, K, n)
    assert np.all(np.asarray(res.converged))
    for b in range(B):
        pb = precond.build(BlockTridiag(blocks[b]), "block_jacobi").blocks
        r1 = jnp_backend.pcg_jnp(blocks[b], pb, gamma[b], lam0[b],
                                 exit_tol=1e-7, max_iter=200)
        assert abs(int(res.iters[b]) - int(r1.iters)) <= 1
        np.testing.assert_allclose(np.asarray(res.lam[b]),
                                   np.asarray(r1.lam), rtol=2e-4, atol=2e-5)


def test_k_padding_preserves_iterates_exactly():
    """Direct-sum identity padding of the chain is mathematically inert:
    iteration counts must match exactly (the padded rows carry zero residual
    forever); the solution may drift by fp32 reduction-order ulps only (the
    dot sums over K_pad instead of K elements)."""
    from tpcg.ops.packed import pad_systems

    B, n, K = 2, 4, 12
    blocks, gamma = _batch(B, n, K, seed=13)
    lam0 = jnp.zeros_like(gamma)
    S_p, _, g_p, l_p = pad_systems(blocks, None, gamma, lam0, 16, 2)
    for b in range(B):
        pb = precond.build(BlockTridiag(blocks[b]), "block_jacobi").blocks
        pbp = precond.build(BlockTridiag(S_p[b]), "block_jacobi").blocks
        r = jnp_backend.pcg_jnp(blocks[b], pb, gamma[b], lam0[b],
                                exit_tol=1e-7, max_iter=200)
        rp = jnp_backend.pcg_jnp(S_p[b], pbp, g_p[b], l_p[b],
                                 exit_tol=1e-7, max_iter=200)
        assert int(r.iters) == int(rp.iters)
        np.testing.assert_array_equal(np.asarray(rp.lam[K:]), 0.0)
        np.testing.assert_allclose(np.asarray(rp.lam[:K]),
                                   np.asarray(r.lam), rtol=2e-4, atol=2e-5)


def test_packed_guard_freezes_poisoned_system():
    """One singular system in the pack (S=0: alpha = eta/0 on the first
    pass): with stop_on_nonfinite the poisoned system freezes early with
    converged=False while its packmates converge normally — per-system
    semantics of the single-system loop-predicate guard."""
    P, K, n = 2, 32, 4  # K=32: the config the grid kernel CANNOT serve
    blocks, gamma = _batch(P, n, K, seed=21)
    blocks = blocks.at[0].set(0.0)
    lam0 = jnp.zeros_like(gamma)
    res = pcg_pallas_packed(blocks, None, gamma, lam0, exit_tol=1e-7,
                            max_iter=200, precond="identity", P=P,
                            stop_on_nonfinite=True, interpret=True)
    assert not bool(res.converged[0])
    assert int(res.iters[0]) < 200
    assert not np.isfinite(float(res.eta[0]))
    assert bool(res.converged[1])
    assert np.all(np.isfinite(np.asarray(res.lam[1])))
    # unguarded: the poisoned system burns the whole pack budget
    res_u = pcg_pallas_packed(blocks, None, gamma, lam0, exit_tol=1e-7,
                              max_iter=50, precond="identity", P=P,
                              interpret=True)
    assert int(res_u.iters[0]) == 50


@pytest.mark.parametrize("method", ["classic", "pipelined"])
def test_packed_guard_routed_from_backend(method):
    """A divergence-guarded K=32 fleet must run lane-packed (round-2
    routing sent it to the grid kernel, which raised on K % 128 != 0)."""
    from tpcg.solver import pallas_backend

    B, n, K = 4, 4, 32
    blocks, gamma = _batch(B, n, K, seed=22)
    blocks = blocks.at[1].set(0.0)
    lam0 = jnp.zeros_like(gamma)
    res = pallas_backend.pcg_pallas_batched(
        blocks, None, gamma, lam0, exit_tol=1e-7, max_iter=200,
        precond="block_jacobi", method=method, stop_on_nonfinite=True,
        interpret=True)
    ok = [b for b in range(B) if b != 1]
    assert not bool(res.converged[1]) and int(res.iters[1]) < 200
    for b in ok:
        assert bool(res.converged[b]), f"system {b}"
        pb = precond.build(BlockTridiag(blocks[b]), "block_jacobi").blocks
        solver = (pcg_pipelined_jnp if method == "pipelined"
                  else jnp_backend.pcg_jnp)
        r1 = solver(blocks[b], pb, gamma[b], lam0[b], exit_tol=1e-7,
                    max_iter=200)
        # looser than the parity tests: the packed loop's freeze points and
        # replacement cadence can differ by a pass, and this test is about
        # the guard, not tight iterate parity
        np.testing.assert_allclose(np.asarray(res.lam[b]),
                                   np.asarray(r1.lam), rtol=2e-3, atol=2e-4)


def test_packed_fixed_matches_per_system():
    """Lane-packed fixed-budget mode: every system runs exactly max_iter
    passes and matches the per-system jnp fixed oracle; plan_pack dummies
    (zero rhs) stay parked at zero through the budget."""
    P, K, n, budget = 4, 8, 4, 60
    blocks, gamma = _batch(P, n, K, seed=23)
    gamma = gamma.at[0].set(0.0)  # converged at entry, no exit test
    lam0 = jnp.zeros_like(gamma)
    res = pcg_pallas_packed(blocks, None, gamma, lam0, exit_tol=1e-7,
                            max_iter=budget, precond="symmetric_stair",
                            method="fixed", P=P, interpret=True)
    assert np.all(np.asarray(res.iters) == budget)
    assert np.all(np.asarray(res.lam[0]) == 0)
    for b in range(1, P):
        pb = precond.build(BlockTridiag(blocks[b]),
                           "symmetric_stair").blocks
        r1 = jnp_backend.pcg_fixed_jnp(blocks[b], pb, gamma[b], lam0[b],
                                       exit_tol=1e-7, max_iter=budget)
        assert bool(res.converged[b]) == bool(r1.converged)
        np.testing.assert_allclose(np.asarray(res.lam[b]),
                                   np.asarray(r1.lam), rtol=2e-4,
                                   atol=2e-5)


def test_packed_fixed_routed_from_backend():
    """A fixed-budget K=32 fleet keeps the lane-packing amortization
    (round-2 routing forced the grid kernel, raising on K % 128 != 0)."""
    from tpcg.solver import pallas_backend

    B, n, K = 4, 4, 32
    blocks, gamma = _batch(B, n, K, seed=24)
    lam0 = jnp.zeros_like(gamma)
    res = pallas_backend.pcg_pallas_batched(
        blocks, None, gamma, lam0, exit_tol=1e-7, max_iter=50,
        precond="block_jacobi", method="fixed", interpret=True)
    assert np.all(np.asarray(res.iters) == 50)
    assert np.all(np.asarray(res.converged))


def test_plan_pack_selects_stream_at_fleet_scale():
    """VERDICT r2 item 5: the fleet-bench config (B=256, n=14, K=128,
    in-kernel symmetric_stair) must actually select the manual-DMA stream
    variant at double the buffered-fast width — if this regresses, the
    measured-fastest path silently falls off."""
    from tpcg.ops.packed import plan_pack

    for method in ("pipelined", "classic", "fixed"):
        plan = plan_pack(256, 128, 14, jnp.float32,
                         precond="symmetric_stair", method=method)
        assert plan is not None
        P, K_pad, B_pad, stream = plan
        assert stream, f"stream not selected for {method}"
        assert (P, K_pad, B_pad) == (8, 128, 256), method
    # short chains stay buffered (stream measured a wash at K=32)
    plan32 = plan_pack(256, 32, 14, jnp.float32,
                       precond="symmetric_stair", method="pipelined")
    assert plan32 is not None and not plan32[3]


def test_packed_pipelined_replacement_is_per_system():
    """Regression: the packed pipelined loop's residual-replacement eta
    guard must be PER SYSTEM. The old all-systems guard disabled
    replacement for the whole pack the moment any one system converged
    (its eta drops under the 1000*tol guard forever) — observed as
    packed-pipelined stagnation on warm-started NMPC fleets. Here system
    0 starts AT its solution (converges on entry) while system 1 is
    ill-conditioned enough that pipelined CG *requires* replacement
    (measured: 49 iters with the cadence, max_iter exhaustion without) —
    under the old guard this test fails."""
    from tpcg.layout import random_spd_cbtd

    n, K, tol = 4, 32, 1e-9
    S1 = random_spd_cbtd(jax.random.PRNGKey(3), n, K, diag_boost=0.1)
    g1 = jnp.ones((K, n), jnp.float32)
    S0 = random_spd_cbtd(jax.random.PRNGKey(4), n, K)
    g0 = jnp.ones((K, n), jnp.float32)
    # exact f64 solution as system 0's warm start -> converged on entry
    lam0_exact = jnp.asarray(np.linalg.solve(
        np.asarray(S0.dense(), np.float64),
        np.asarray(g0, np.float64).reshape(-1)).reshape(K, n), jnp.float32)
    blocks = jnp.stack([S0.blocks, S1.blocks])
    gamma = jnp.stack([g0, g1])
    lam0 = jnp.stack([lam0_exact, jnp.zeros_like(g1)])
    res = pcg_pallas_packed(blocks, None, gamma, lam0, exit_tol=tol,
                            max_iter=300, precond="block_jacobi",
                            method="pipelined", P=2, interpret=True)
    assert int(res.iters[0]) <= 2
    assert bool(res.converged[1]), int(res.iters[1])
    # parity with the per-solve-cadence jnp twin
    pb = precond.build(S1, "block_jacobi").blocks
    r1 = pcg_pipelined_jnp(S1.blocks, pb, g1, jnp.zeros_like(g1),
                           exit_tol=tol, max_iter=300)
    assert abs(int(res.iters[1]) - int(r1.iters)) <= 3, (
        int(res.iters[1]), int(r1.iters))
