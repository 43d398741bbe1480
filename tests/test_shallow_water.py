"""Rotating shallow-water model tests (second model family; reference
companion benchmark is a shallow-water atmosphere, BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gb25_tpu.grids import simple_latitude_longitude_grid
from gb25_tpu.models.shallow_water import (
    ShallowWaterConfig,
    shallow_water_state,
    sw_loop,
    sw_time_step,
)


def _grid():
    return simple_latitude_longitude_grid(48, 24, 1, dtype=jnp.float64)


def test_resting_state_stays_resting():
    grid = _grid()
    cfg = ShallowWaterConfig()
    s = shallow_water_state(grid, h0=1000.0)
    s = jax.jit(sw_loop, static_argnames="n")(cfg, grid, s, 60.0, 10)
    assert float(jnp.abs(s.u).max()) < 1e-12
    np.testing.assert_allclose(np.asarray(s.h), 1000.0)


def test_gravity_wave_and_mass_conservation():
    grid = _grid()
    cfg = ShallowWaterConfig(coriolis=0.0)
    s = shallow_water_state(grid, h0=1000.0)
    lam = grid.lam_c_i.reshape(-1, 1)
    phi = grid.phi_c_i.reshape(1, -1)
    bump = 1.0 * jnp.exp(-((lam - 180.0) ** 2 + phi**2) / 300.0)
    s = s.replace(h=s.h + bump)
    hy = grid.hy
    az = np.asarray(grid.azc)[0, hy : hy + grid.Ny, 0]
    mass0 = float((np.asarray(s.h) * az[None, :]).sum())
    # c = sqrt(gH) ~ 100 m/s; dx_min ~ 150 km -> dt = 60 s safe
    s = jax.jit(sw_loop, static_argnames="n")(cfg, grid, s, 60.0, 200)
    mass1 = float((np.asarray(s.h) * az[None, :]).sum())
    assert abs(mass1 - mass0) / mass0 < 1e-12  # conservative mass flux
    assert float(jnp.abs(s.h - 1000.0).max()) < 2.0  # wave radiated, bounded
    assert bool(jnp.isfinite(s.u).all())


def test_geostrophic_adjustment_produces_balanced_flow():
    grid = _grid()
    cfg = ShallowWaterConfig()
    s = shallow_water_state(grid, h0=1000.0)
    phi = grid.phi_c_i.reshape(1, -1)
    ridge = 2.0 * jnp.exp(-((phi - 40.0) ** 2) / 50.0) + 0.0 * grid.lam_c_i.reshape(-1, 1)
    s = s.replace(h=s.h + ridge)
    s = jax.jit(sw_loop, static_argnames="n")(cfg, grid, s, 60.0, 400)
    # a zonal jet should emerge along the ridge flank
    assert float(jnp.abs(s.u).max()) > 0.01
    assert float(jnp.abs(s.u).max()) < 10.0
    assert bool(jnp.isfinite(s.h).all())


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_serial():
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from gb25_tpu.parallel import make_comm, make_mesh
    from gb25_tpu.parallel.localize import localize_grid

    grid = simple_latitude_longitude_grid(32, 16, 1, dtype=jnp.float64)
    cfg = ShallowWaterConfig()
    s = shallow_water_state(grid, h0=500.0)
    lam = grid.lam_c_i.reshape(-1, 1)
    phi = grid.phi_c_i.reshape(1, -1)
    s = s.replace(h=s.h + 1.0 * jnp.exp(-((lam - 90.0) ** 2 + (phi + 20.0) ** 2) / 400.0))

    ref = jax.jit(sw_loop, static_argnames="n")(cfg, grid, s, 60.0, 5)

    mesh = make_mesh(8, shape=(4, 2))
    comm = make_comm(mesh, grid)
    spec2 = P("x", "y")
    sspec = jax.tree_util.tree_map(lambda x: spec2 if x.ndim == 2 else P(), s)
    gspec = jax.tree_util.tree_map(lambda _: P(), grid)

    @partial(jax.shard_map, mesh=mesh, in_specs=(sspec, gspec), out_specs=sspec)
    def run(st, g):
        lg = localize_grid(g, comm, grid.Nx // 4, grid.Ny // 2)
        return sw_loop(cfg, lg, st, 60.0, 5, comm)

    sh = run(s, grid)
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-13)
