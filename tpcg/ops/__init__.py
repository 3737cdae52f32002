"""Pallas/VPU compute primitives (the reference's device layer:
utils.cuh + the GLASS micro-BLAS, rebuilt TPU-first)."""

from tpcg.ops.bdmv import bdmv, bdmv_pallas, shift_down, shift_up
from tpcg.ops.multirhs import pcg_pallas_multirhs
