"""Precision-lowering tests (reference analog: Reactant.MultiFloatOptions
f32->bf16 lowering experiments, src/arg_parsing.jl:99-107)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gb25_tpu.grids import simple_latitude_longitude_grid
from gb25_tpu.models import (
    baroclinic_instability_config,
    baroclinic_instability_state,
    loop,
)


def test_bf16_compute_tracks_f32():
    grid = simple_latitude_longitude_grid(32, 16, 6, dtype=jnp.float32)
    cfg32 = baroclinic_instability_config()
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    state = baroclinic_instability_state(grid, noise_velocity=1e-3)
    lp = jax.jit(loop, static_argnames="n")
    s32 = lp(cfg32, grid, state, 60.0, 10)
    s16 = lp(cfg16, grid, state, 60.0, 10)
    # state stays f32
    assert s16.u.dtype == jnp.float32
    # bf16 tendencies track f32 within bf16 resolution over a short run
    du = float(jnp.abs(s16.u - s32.u).max())
    scale = float(jnp.abs(s32.u).max())
    assert du < 0.15 * max(scale, 1e-6), (du, scale)
    T32, T16 = np.asarray(s32.tracers["T"]), np.asarray(s16.tracers["T"])
    assert np.abs(T16 - T32).max() < 0.3
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(s16))
