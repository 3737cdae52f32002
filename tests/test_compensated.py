"""Double-float primitives (tpcg/ops/df.py) and the compensated-
accumulation fused kernel (tpcg/ops/compensated.py) — the TPU-native
answer to the reference's fp64 kernel instantiation
(examples/pcg_solve_dp.cu; VERDICT r2 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpcg import BlockTridiag, PCGConfig, layout, pcg_solve, precond
from tpcg.ops import df as dfa
from tpcg.solver import jnp_backend


def test_two_sum_two_prod_exact():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(64).astype(np.float32)) * 1e3
    b = jnp.asarray(rng.randn(64).astype(np.float32)) * 1e-3
    s, e = dfa.two_sum(a, b)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64),
        np.asarray(a, np.float64) + np.asarray(b, np.float64))
    p, e = dfa.two_prod(a, b)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64),
        np.asarray(a, np.float64) * np.asarray(b, np.float64))


def test_df_dot_beats_f32_sum():
    """The pairwise-DF dot must track the f64 dot to ~1e-13 relative on a
    cancellation-heavy input where plain f32 summation loses digits."""
    rng = np.random.RandomState(1)
    n, K = 8, 192  # non-power-of-two lanes exercises the odd-fold path
    x = rng.randn(n, K).astype(np.float32) * 100
    y = rng.randn(n, K).astype(np.float32)
    want = float(np.sum(x.astype(np.float64) * y.astype(np.float64)))
    hi, lo = dfa.df_dot(dfa.df(jnp.asarray(x)), jnp.asarray(y), (n, K))
    got = float(np.asarray(hi, np.float64)[0, 0]
                + np.asarray(lo, np.float64)[0, 0])
    got_f32 = float(jnp.sum(jnp.asarray(x) * jnp.asarray(y)))
    assert abs(got - want) <= 1e-10 * abs(want) + 1e-10
    # and it is genuinely better than the native sum
    assert abs(got - want) < abs(got_f32 - want) or got_f32 == want


def test_df_div_accuracy():
    a = dfa.df(jnp.float32(1.0))
    b = dfa.df(jnp.float32(3.0))
    q = dfa.df_div(a, b)
    got = float(np.asarray(q[0], np.float64) + np.asarray(q[1], np.float64))
    assert abs(got - 1.0 / 3.0) < 1e-14


def _sys(n, K, seed=0):
    S = layout.random_spd_cbtd(jax.random.PRNGKey(seed), n, K,
                               dtype=jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(seed + 1), (K, n), jnp.float32)
    return S, g


def test_compensated_beats_f32_true_accuracy():
    """The point of the mode: CG's RECURRENCE eta keeps shrinking past any
    tolerance (the exit test cannot see the stall), but the TRUE solution
    error of an f32 solve floors at ~eps_f32-relative.

    CPU caveat (tpcg/ops/df.py docstring): XLA:CPU's FMA contraction
    degrades the compensation under jit, so off-chip this asserts only a
    CLEAR improvement; the fp64-grade bound (5.6e-14 relative measured on
    a v5e at tol 1e-24) is asserted on hardware
    (tests/test_tpu_hardware.py::test_compensated_fp64_grade_on_chip)."""
    for seed in (3, 5, 9):
        S, g = _sys(6, 24, seed=seed)
        tol, mi = 1e-13, 400
        f32 = pcg_solve(S, g, config=PCGConfig(
            exit_tol=tol, max_iter=mi, preconditioner="symmetric_stair"),
            backend="jnp")
        comp = pcg_solve(S, g, config=PCGConfig(
            exit_tol=tol, max_iter=mi, preconditioner="symmetric_stair",
            accumulate="compensated"))
        assert bool(comp.converged)
        x = np.linalg.solve(np.asarray(S.dense(), np.float64),
                            np.asarray(g, np.float64).reshape(-1))
        nrm = np.abs(x).max()
        e_f32 = np.abs(np.asarray(f32.lam, np.float64).reshape(-1)
                       - x).max() / nrm
        e_cmp = np.abs(np.asarray(comp.lam, np.float64).reshape(-1)
                       - x).max() / nrm
        assert e_cmp < 3e-7, (seed, e_cmp)
        assert e_cmp < 0.7 * e_f32, (seed, e_cmp, e_f32)


def test_compensated_matches_f64_iteration_count():
    """BASELINE config-2 criterion: the compensated kernel's iteration
    count at a deep tolerance matches the full-f64 jnp solve (the fp64
    oracle) within the usual +-1 slack."""
    S, g = _sys(4, 12, seed=7)
    S64 = BlockTridiag(jnp.asarray(np.asarray(S.blocks), jnp.float64))
    g64 = jnp.asarray(np.asarray(g), jnp.float64)
    Pb64 = precond.build(S64, "symmetric_stair").blocks
    tol = 1e-11
    r64 = jnp_backend.pcg_jnp(S64.blocks, Pb64, g64, jnp.zeros_like(g64),
                              exit_tol=tol, max_iter=300)
    comp = pcg_solve(S, g, config=PCGConfig(
        exit_tol=tol, max_iter=300, preconditioner="symmetric_stair",
        accumulate="compensated"))
    assert bool(r64.converged) and bool(comp.converged)
    assert abs(int(comp.iters) - int(r64.iters)) <= 1
    np.testing.assert_allclose(np.asarray(comp.lam, np.float64),
                               np.asarray(r64.lam, np.float64),
                               rtol=1e-5, atol=1e-7)


def test_compensated_golden_fp64_config():
    """The bundled fp64 example shape (examples/pcg_solve_dp.cu): solve
    the golden system to 1e-12 in-kernel at f32 storage."""
    from tpcg.models import golden

    S, g, _ = golden.system()
    comp = pcg_solve(S, g, config=PCGConfig(
        exit_tol=1e-12, max_iter=50, preconditioner="symmetric_stair",
        accumulate="compensated"))
    assert bool(comp.converged)
    S64 = np.asarray(S.dense(), np.float64)
    x = np.linalg.solve(S64, np.asarray(g, np.float64).reshape(-1))
    np.testing.assert_allclose(np.asarray(comp.lam).reshape(-1), x,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("pre", ["identity", "block_jacobi", "explicit"])
def test_compensated_preconditioner_paths(pre):
    S, g = _sys(5, 16, seed=11)
    cfg = dict(exit_tol=1e-11, max_iter=400, accumulate="compensated")
    if pre == "explicit":
        Pinv = precond.build(S, "symmetric_stair")
        res = pcg_solve(S, g, config=PCGConfig(
            preconditioner="explicit", **cfg), Pinv=Pinv)
    else:
        res = pcg_solve(S, g, config=PCGConfig(preconditioner=pre, **cfg))
    assert bool(res.converged)
    x = np.linalg.solve(np.asarray(S.dense(), np.float64),
                        np.asarray(g, np.float64).reshape(-1))
    np.testing.assert_allclose(np.asarray(res.lam).reshape(-1), x,
                               rtol=1e-4, atol=1e-5)


def test_compensated_rejections():
    S, g = _sys(4, 8)
    with pytest.raises(ValueError, match="classic"):
        pcg_solve(S, g, config=PCGConfig(accumulate="compensated",
                                         method="pipelined"))
    import tpcg
    with pytest.raises(ValueError, match="single-system"):
        tpcg.pcg_solve_batched(
            jnp.stack([S.blocks, S.blocks]), jnp.stack([g, g]),
            config=PCGConfig(accumulate="compensated"))
    with pytest.raises(ValueError, match="accumulate"):
        PCGConfig(accumulate="double")