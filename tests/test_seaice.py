"""Prognostic slab sea-ice tests (models/seaice.py).

The reference's benchmark configuration carries only the implicit
FreezingLimitedOceanTemperature (ClimaOcean's OceanSeaIceModel constructor
default); SlabSeaIce is the prognostic zero-layer component that slot is
designed for. Tests: skin-temperature balance, Stefan-regime growth, warm
melt, frazil enthalpy bookkeeping, conservative advection, coupled smoke.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gb25_tpu.grids import simple_latitude_longitude_grid
from gb25_tpu.models.coupled import (
    coupled_ice_loop,
    coupled_ice_time_step,
    data_free_ocean_climate_model,
)
from gb25_tpu.models.seaice import (
    SeaIceState,
    SlabSeaIce,
    _skin_temperature,
    initial_ice_state,
    seaice_advect,
    seaice_thermodynamics,
)
from gb25_tpu.models.state import initial_state


def _cold_atmos(shape, Ta=253.15, sw=0.0):
    return {
        "ua": jnp.full(shape, 5.0), "va": jnp.zeros(shape),
        "Ta": jnp.full(shape, Ta), "qa": jnp.full(shape, 1e-3),
        "pa": jnp.full(shape, 101325.0),
        "Qsw": jnp.full(shape, sw), "Qlw": jnp.full(shape, 200.0),
    }


def _setup(Nx=16, Ny=12, Nz=4, T0=-1.0, S0=35.0):
    grid = simple_latitude_longitude_grid(Nx, Ny, Nz, dtype=jnp.float32)
    state = initial_state(grid, ("T", "S"), jnp.float32)
    tr = dict(state.tracers)
    tr["T"] = jnp.full(grid.shape, T0, jnp.float32)
    tr["S"] = jnp.full(grid.shape, S0, jnp.float32)
    state = state.replace(tracers=tr)
    return grid, state


def test_skin_temperature_balances_fluxes():
    """Newton iterations must leave a ~zero residual in the zero-layer
    surface energy balance (away from the melting clamp)."""
    si = SlabSeaIce()
    shape = (4, 4)
    af = _cold_atmos(shape)
    h = jnp.full(shape, 0.8)
    T_f = jnp.full(shape, -1.9)
    Ts = _skin_temperature(si, h, T_f, af)
    assert float(Ts.max()) < 0.0  # no clamp active in this regime
    # residual of the balance the solve targets
    Ts_K = Ts + 273.15
    U = jnp.sqrt(af["ua"] ** 2 + af["va"] ** 2) + 0.1
    cs = si.rho_air * si.cp_air * si.transfer_coefficient * U
    F = ((1 - si.albedo) * af["Qsw"]
         + si.emissivity * (af["Qlw"] - si.stefan_boltzmann * Ts_K**4)
         + cs * (af["Ta"] - Ts_K) + si.conductivity / h * (T_f - Ts))
    assert float(jnp.abs(F).max()) < 0.5  # W/m^2, of O(100) terms


def test_stefan_growth_cold_atmosphere():
    """Cold dark atmosphere over thin ice: basal growth at the zero-layer
    rate dh/dt = (Q_c - Q_oi)/(rho_i L), with SST at the freezing point so
    Q_oi = 0; thinner ice grows faster (Stefan regime)."""
    si = SlabSeaIce()
    grid, state = _setup(T0=-1.9175)  # T_f(35) = -0.054*35.5? use exact below
    Tf = float(si.liquidus.freezing_temperature(jnp.float32(35.0)))
    tr = dict(state.tracers)
    tr["T"] = jnp.full(grid.shape, Tf, jnp.float32)
    state = state.replace(tracers=tr)
    af = _cold_atmos((grid.Nx, grid.Ny))
    dt = 3600.0

    thin = SeaIceState(v=jnp.full((grid.Nx, grid.Ny), 0.2),
                       a=jnp.ones((grid.Nx, grid.Ny)))
    thick = SeaIceState(v=jnp.full((grid.Nx, grid.Ny), 2.0),
                        a=jnp.ones((grid.Nx, grid.Ny)))
    new_thin, coup_thin = seaice_thermodynamics(si, grid, af, state, thin, dt)
    new_thick, coup_thick = seaice_thermodynamics(si, grid, af, state, thick, dt)
    g_thin = float((new_thin.v - thin.v).mean())
    g_thick = float((new_thick.v - thick.v).mean())
    assert g_thin > g_thick > 0.0
    # rate agrees with the conductive flux bookkeeping
    expect = float(coup_thin["Q_conductive"].mean()) * dt / (si.rho_ice * si.latent_fusion)
    assert abs(g_thin - expect) / expect < 1e-3


def test_warm_ocean_melts_ice():
    si = SlabSeaIce()
    grid, state = _setup(T0=2.0)  # 2 C water under the ice
    af = _cold_atmos((grid.Nx, grid.Ny), Ta=275.15, sw=200.0)
    dt = 6 * 3600.0
    ice = SeaIceState(v=jnp.full((grid.Nx, grid.Ny), 1.0),
                      a=jnp.full((grid.Nx, grid.Ny), 0.9))
    new, coup = seaice_thermodynamics(si, grid, af, state, ice, dt)
    assert float((new.v - ice.v).max()) < 0.0      # melting everywhere
    assert float((new.a - ice.a).max()) < 0.0      # concentration shrinks
    assert float(coup["Q_basal"].min()) > 0.0      # ocean heats the ice base
    assert float(coup["T_flux"].max()) < 0.0       # ...and loses that heat


def test_frazil_enthalpy_bookkeeping():
    """A supercooled top cell freezes: new ice volume carries exactly the
    latent heat the returned T_flux puts back into the ocean."""
    si = SlabSeaIce()
    grid, state = _setup(T0=-2.5, S0=35.0)  # below T_f(35) = -1.89
    af = _cold_atmos((grid.Nx, grid.Ny))
    dt = 1800.0
    ice = initial_ice_state(grid)
    new, coup = seaice_thermodynamics(si, grid, af, state, ice, dt)
    assert float(new.v.min()) > 0.0
    assert float(new.a.min()) >= si.min_concentration
    hz, Nz = grid.hz, grid.Nz
    dz_top = float(grid.dz_c[0, 0, hz + Nz - 1])
    Tf = float(si.liquidus.freezing_temperature(jnp.float32(35.0)))
    # the heat released (T_flux * dt, deposited over dz_top) restores the
    # top cell to the freezing point
    warmed = -2.5 + float(coup["T_flux"][0, 0]) * dt / dz_top
    assert abs(warmed - Tf) < 1e-3
    # latent heat balance: v * rho_i * L == extracted deficit
    deficit = (Tf - (-2.5)) * si.rho_ocean * si.cp_ocean * dz_top
    assert abs(float(new.v[0, 0]) * si.rho_ice * si.latent_fusion - deficit) / deficit < 1e-3


def test_advection_conserves_volume():
    """Uniform zonal free drift on the periodic-x grid: total ice volume
    (sum v * Az) is conserved by the flux-form upwind scheme."""
    si = SlabSeaIce(wind_drift_factor=0.0)  # drift = ocean surface current
    grid, state = _setup(Nx=24, Ny=12)
    state = state.replace(u=jnp.full(grid.shape, 0.5, jnp.float32))
    af = _cold_atmos((grid.Nx, grid.Ny))
    key = jax.random.PRNGKey(0)
    v0 = jax.random.uniform(key, (grid.Nx, grid.Ny), jnp.float32)
    ice = SeaIceState(v=v0, a=jnp.clip(v0 * 2, 0.0, 1.0))
    az = grid.azc[:, grid.hy : grid.hy + grid.Ny, 0]  # (1 or X, Ny)
    az = jnp.broadcast_to(az, (grid.Nx, grid.Ny))
    tot0 = float(jnp.sum(ice.v * az))
    for _ in range(5):
        ice = seaice_advect(si, grid, state, ice, af, dt=20_000.0)
    assert abs(float(jnp.sum(ice.v * az)) - tot0) / tot0 < 1e-5
    assert float(ice.v.min()) >= 0.0


def test_coupled_slab_ice_smoke():
    """Data-free climate model with the prognostic slab component: a few
    coupled steps stay finite, bounded, and grow ice where polar water
    supercools."""
    ccfg, grid, atmos, state = data_free_ocean_climate_model(
        resolution=24.0, Nz=4, closure=None, sea_ice="slab")
    # polar-cold initial temperature so the high-lat rows freeze
    tr = dict(state.tracers)
    tr["T"] = jnp.where(jnp.abs(jnp.asarray(grid.phi_c_i)[None, :, None]) > 60.0,
                        -2.2, tr["T"]).astype(jnp.float32)
    state = state.replace(tracers=tr)
    ice = initial_ice_state(grid)
    state, ice = jax.jit(
        lambda s, i: coupled_ice_loop(ccfg, grid, atmos, s, i, 600.0, 4)
    )(state, ice)
    assert np.isfinite(np.asarray(state.u)).all()
    assert np.isfinite(np.asarray(ice.v)).all()
    assert float(ice.a.max()) <= 1.0 and float(ice.a.min()) >= 0.0
    assert float(ice.v.min()) >= 0.0
    assert float(ice.v.max()) > 0.0  # the supercooled band froze
    # ice only where it is cold
    mid = np.abs(np.asarray(grid.phi_c_i)) < 40.0
    assert float(jnp.asarray(ice.v)[:, mid].max()) == 0.0
