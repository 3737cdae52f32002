"""Protects the driver contract: __graft_entry__.entry() must be jittable
single-chip; dryrun_multichip(n) must compile+run the sharded train step."""

import importlib.util
import os

import jax
import numpy as np


def _load():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs():
    mod = _load()
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.lam)
    assert out.lam.shape == (128, 14)
    assert bool(out.converged)


def test_dryrun_multichip_8():
    _load().dryrun_multichip(8)


def test_dryrun_multichip_3():
    _load().dryrun_multichip(3)
