"""CATKE closure tests (reference: CATKEVerticalDiffusivity with tracer e,
baroclinic_instability_model.jl:29-30,50-51; less_simple_sharding_problem.jl:90)."""

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
from gb25_tpu.models.catke import CATKEVerticalDiffusivity


def _grid():
    return simple_latitude_longitude_grid(16, 12, 10, dtype=jnp.float64)


def test_config_adds_tke_tracer():
    cfg = baroclinic_instability_config(closure=CATKEVerticalDiffusivity())
    assert cfg.tracers == ("T", "S", "e")


def test_catke_runs_stably():
    grid = _grid()
    cfg = baroclinic_instability_config(closure=CATKEVerticalDiffusivity())
    state = baroclinic_instability_state(grid, tracers=cfg.tracers)
    s = jax.jit(loop, static_argnames="n")(cfg, grid, state, 120.0, 30)
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(s))
    e = np.asarray(s.tracers["e"])
    assert (e >= 0.0).all()


def test_shear_produces_tke_and_mixes():
    """A sheared column produces TKE; an unstable (convective) column mixes
    temperature toward uniformity."""
    grid = _grid()
    cfg = baroclinic_instability_config(
        closure=CATKEVerticalDiffusivity(),
        momentum_advection="none", tracer_advection="none",
    )
    z = grid.z_c_i.reshape(1, 1, -1)
    shape = grid.shape
    # unstable stratification: warm water at the bottom
    T = jnp.broadcast_to(10.0 - 2e-3 * z, shape)
    S = jnp.full(shape, 35.0)
    u = jnp.broadcast_to(0.2 * (1.0 + z / 4000.0) + 0 * z, shape)  # sheared
    state = initial_state(grid, cfg.tracers, jnp.float64).replace(
        u=u, tracers={"T": T, "S": S, "e": jnp.full(shape, 1e-6)}
    )
    s = jax.jit(loop, static_argnames="n")(cfg, grid, state, 300.0, 50)
    e = np.asarray(s.tracers["e"])
    assert e.max() > 1e-5  # TKE grew from shear + convection
    # convective mixing reduced the vertical T contrast
    T0 = np.asarray(T)
    T1 = np.asarray(s.tracers["T"])
    contrast0 = T0[..., -1].mean() - T0[..., 0].mean()
    contrast1 = T1[..., -1].mean() - T1[..., 0].mean()
    assert abs(contrast1) < abs(contrast0)


def test_stable_column_stays_quiet():
    """Stably stratified, unsheared column: TKE stays at the floor and the
    temperature profile is essentially untouched."""
    grid = _grid()
    cfg = baroclinic_instability_config(
        closure=CATKEVerticalDiffusivity(),
        momentum_advection="none", tracer_advection="none",
    )
    z = grid.z_c_i.reshape(1, 1, -1)
    T = jnp.broadcast_to(10.0 + 2e-3 * z, grid.shape)
    S = jnp.full(grid.shape, 35.0)
    state = initial_state(grid, cfg.tracers, jnp.float64).replace(
        tracers={"T": T, "S": S, "e": jnp.full(grid.shape, 1e-6)}
    )
    s = jax.jit(loop, static_argnames="n")(cfg, grid, state, 300.0, 50)
    assert float(jnp.abs(s.tracers["T"] - T).max()) < 1e-3
    assert float(s.tracers["e"].max()) < 1e-4
