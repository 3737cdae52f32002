"""Block helpers, feasibility checks, and timing utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpcg import layout
from tpcg.ops import block
from tpcg.utils import feasibility
from tpcg.utils.timing import chain_solves, wall_time


def test_load_store_block(rng):
    blocks = jnp.asarray(rng.standard_normal((4, 3, 3, 3)))
    b = block.load_block(blocks, block.DIAG, 2)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(blocks[2, 1]))
    bt = block.load_block(blocks, block.RIGHT, 1, transpose=True)
    np.testing.assert_array_equal(np.asarray(bt),
                                  np.asarray(blocks[1, 2]).T)
    out = block.store_block(blocks, b, block.LEFT, 3, multiplier=2)
    np.testing.assert_allclose(np.asarray(out[3, 0]), 2 * np.asarray(b))


def test_block_bounds():
    blocks = jnp.zeros((4, 3, 2, 2))
    with pytest.raises(ValueError, match="bcol"):
        block.load_block(blocks, 3, 0)
    with pytest.raises(ValueError, match="brow"):
        block.load_block(blocks, 0, 4)


def test_symmetrize(rng):
    blocks = jnp.asarray(rng.standard_normal((5, 3, 2, 2)))
    sym = block.symmetrize(blocks)
    dense = np.asarray(layout.cbtd_to_dense(sym))
    np.testing.assert_allclose(dense, dense.T, atol=1e-12)


def test_feasibility_accepts_reference_scales():
    # round-2 kernel: explicit-Pinv lean verified OK on hardware at K=2048
    for n, K in [(2, 3), (12, 64), (14, 128), (14, 512), (14, 1024),
                 (14, 2048)]:
        feasibility.check_fused_fits(n, K)  # must not raise


def test_feasibility_rejects_huge_and_names_limit():
    # explicit-Pinv lean verified OOM on hardware at K=3072 (19.06 MiB)
    with pytest.raises(ValueError, match="Max feasible knot_points"):
        feasibility.check_fused_fits(14, 3072)
    with pytest.raises(ValueError, match="Max feasible knot_points"):
        feasibility.check_fused_fits(14, 200_000)


def test_vmem_budget_env_override(monkeypatch):
    # TPCG_VMEM_BYTES is the deployment knob for uncalibrated generations:
    # it must override the table, re-read on every call (no cache_clear
    # dance — setting it mid-process takes effect immediately)
    monkeypatch.setenv("TPCG_VMEM_BYTES", str(64 * 1024 * 1024))
    assert feasibility.chip_params()["vmem_bytes"] == 64 * 1024 * 1024
    # a config the v5e budget rejects fits under the widened budget
    feasibility.check_fused_fits(14, 3072)  # must not raise
    monkeypatch.delenv("TPCG_VMEM_BYTES")
    with pytest.raises(ValueError, match="Max feasible knot_points"):
        feasibility.check_fused_fits(14, 3072)
    # bad values are ignored (warn), not fatal; non-positive ints likewise
    for bad in ("lots", "0", "-1"):
        monkeypatch.setenv("TPCG_VMEM_BYTES", bad)
        with pytest.warns(UserWarning, match="TPCG_VMEM_BYTES"):
            row = feasibility.chip_params()
        assert row["vmem_bytes"] > 0  # fell through to the device table


def test_pick_fused_variant_tiers():
    # small shapes -> fast; near the ceiling -> lean; beyond -> raises
    assert feasibility.pick_fused_variant(14, 128,
                                          precond="symmetric_stair") is False
    assert feasibility.pick_fused_variant(14, 1536,
                                          precond="symmetric_stair") is True
    with pytest.raises(ValueError, match="Max feasible"):
        feasibility.pick_fused_variant(14, 4096, precond="symmetric_stair")


def test_chain_solves_runs_and_depends():
    from tpcg.solver import jnp_backend

    S = layout.random_spd_cbtd(jax.random.PRNGKey(0), 3, 8,
                               dtype=jnp.float32)
    g = jnp.ones((8, 3), jnp.float32)
    l0 = jnp.zeros_like(g)
    Pb = S.blocks

    def solve(Sb, P, gg, ll):
        return jnp_backend.pcg_jnp(Sb, P, gg, ll, exit_tol=1e-6, max_iter=50,
                                   identity_pinv=True)

    chained = chain_solves(solve, 4)
    acc, lam = chained(S.blocks, Pb, g, l0)
    assert np.isfinite(float(acc))
    t = wall_time(chained, S.blocks, Pb, g, l0, warmup=1, reps=2)
    assert t > 0
