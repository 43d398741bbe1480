"""k-epsilon closure tests (reference: TKEDissipationVerticalDiffusivity with
tracers e + eps, baroclinic_instability_model.jl:52-54)."""

import jax
import jax.numpy as jnp
import numpy as np

from gb25_tpu.grids import simple_latitude_longitude_grid
from gb25_tpu.models import (
    baroclinic_instability_config,
    baroclinic_instability_state,
    initial_state,
    loop,
)
from gb25_tpu.models.keps import TKEDissipationVerticalDiffusivity


def test_config_adds_tracers():
    cfg = baroclinic_instability_config(closure=TKEDissipationVerticalDiffusivity())
    assert cfg.tracers == ("T", "S", "e", "eps")


def test_keps_runs_stably():
    grid = simple_latitude_longitude_grid(16, 12, 10, dtype=jnp.float64)
    cfg = baroclinic_instability_config(closure=TKEDissipationVerticalDiffusivity())
    state = baroclinic_instability_state(grid, tracers=cfg.tracers)
    s = jax.jit(loop, static_argnames="n")(cfg, grid, state, 120.0, 30)
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(s))
    assert (np.asarray(s.tracers["e"]) >= 0).all()
    assert (np.asarray(s.tracers["eps"]) >= 0).all()


def test_keps_shear_produces_tke():
    grid = simple_latitude_longitude_grid(16, 12, 10, dtype=jnp.float64)
    cfg = baroclinic_instability_config(
        closure=TKEDissipationVerticalDiffusivity(),
        momentum_advection="none", tracer_advection="none",
    )
    z = grid.z_c_i.reshape(1, 1, -1)
    T = jnp.broadcast_to(10.0 + 1e-4 * z, grid.shape)
    u = jnp.broadcast_to(0.5 * (1.0 + z / 4000.0) + 0 * z, grid.shape)
    state = initial_state(grid, cfg.tracers, jnp.float64).replace(
        u=u,
        tracers={"T": T, "S": jnp.full(grid.shape, 35.0),
                 "e": jnp.full(grid.shape, 1e-6), "eps": jnp.full(grid.shape, 1e-9)},
    )
    s = jax.jit(loop, static_argnames="n")(cfg, grid, state, 300.0, 40)
    assert float(s.tracers["e"].max()) > 1e-5
    assert float(s.tracers["eps"].max()) > 1e-9
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(s))
