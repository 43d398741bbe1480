"""Sea-ice components for the coupled model's sea-ice slot.

Two tiers:

1. ``FreezingLimitedOceanTemperature`` — the reference's *implicit* sea ice.
   The reference builds ``OceanSeaIceModel(ocean; atmosphere, radiation,
   interfaces)`` (/root/reference/src/data_free_ocean_climate_model.jl:67,
   simulations/ocean_climate_simulation.jl:89) without passing ``sea_ice``;
   ClimaOcean's default for that constructor is
   ``FreezingLimitedOceanTemperature(LinearLiquidus(FT))``: no prognostic
   ice, but wherever seawater would supercool, its temperature is clamped up
   to the salinity-dependent freezing point, and the air-sea turbulent
   fluxes see the limited surface temperature.

2. ``SlabSeaIce`` — a *prognostic* thermodynamic slab model (capability
   beyond the reference's benchmark configuration; the ClimaSeaIce
   ``SeaIceModel`` the ``OceanSeaIceModel`` slot is designed to carry).
   Zero-layer Semtner (1976) thermodynamics: prognostic cell-mean ice
   volume ``v`` and concentration ``a``; diagnostic skin temperature from
   the surface energy balance (Newton iterations, trace-friendly); basal
   growth/melt against the conductive flux and the ocean-ice basal heat
   flux; frazil formation from supercooled top ocean cells; Hibler (1979)
   lead closing for the concentration; free-drift advection (first-order
   upwind on the C-grid, one width-1 halo exchange — shards exactly like
   the barotropic substep).  Couples back to the ocean through shaded
   (1-a) open-water fluxes, basal heat extraction, and brine-rejection /
   meltwater virtual salt fluxes.

Liquidus: the ClimaSeaIce ``LinearLiquidus`` form T_f(S) = -lambda_1 * S
(slope 0.054 degC/psu, freshwater offset 0): salty water freezes below 0 C.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LinearLiquidus:
    """Freezing temperature T_f(S) = -slope * S (degC, psu)."""

    slope: float = 0.054

    def freezing_temperature(self, S):
        return -self.slope * S


@dataclasses.dataclass(frozen=True)
class FreezingLimitedOceanTemperature:
    """Clamp ocean temperature to be at or above the local freezing point.

    Applied to the whole 3-D temperature field after each coupled step
    (ClimaOcean: ``above_freezing_ocean_temperature!``), and to the surface
    temperature used by the bulk-flux solve.
    """

    liquidus: LinearLiquidus = LinearLiquidus()

    def limit(self, T, S):
        return jnp.maximum(T, self.liquidus.freezing_temperature(S))


def limit_ocean_temperature(sea_ice, state):
    """Return ``state`` with tracers["T"] clamped to the freezing point."""
    if sea_ice is None:
        return state
    T = sea_ice.limit(state.tracers["T"], state.tracers["S"])
    return state.replace(tracers={**state.tracers, "T": T})


# ---------------------------------------------------------------------------
# Prognostic slab sea ice
# ---------------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass, data_fields=["v", "a"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class SeaIceState:
    """Prognostic sea-ice fields on ocean cell centers (2-D).

    ``v``: cell-mean ice volume per unit area (m) — the conserved, advected
    quantity.  ``a``: ice concentration in [0, 1].  Actual floe thickness is
    the diagnostic h = v / max(a, a_min)."""

    v: jax.Array  # (Nx, Ny)
    a: jax.Array  # (Nx, Ny)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def initial_ice_state(grid, dtype=jnp.float32):
    zero = jnp.zeros((grid.Nx, grid.Ny), dtype)
    return SeaIceState(v=zero, a=zero)


@dataclasses.dataclass(frozen=True)
class SlabSeaIce:
    """Zero-layer thermodynamic slab sea ice with free-drift advection.

    Constants follow the standard zero-layer configuration (Semtner 1976;
    Hibler 1979 lead closing; CICE/ClimaSeaIce-magnitude exchange
    coefficients)."""

    liquidus: LinearLiquidus = LinearLiquidus()
    rho_ice: float = 917.0          # kg/m^3
    latent_fusion: float = 334e3    # J/kg
    conductivity: float = 2.1       # W/m/K (pure ice, no snow layer)
    albedo: float = 0.7             # bare ice shortwave albedo
    emissivity: float = 0.98
    ice_salinity: float = 4.0       # psu, bulk ice salinity (brine pockets)
    transfer_coefficient: float = 1e-3   # ice-air sensible-heat bulk coeff
    basal_exchange_velocity: float = 1e-4  # m/s, ocean-ice thermal exchange
    lead_closing_thickness: float = 0.5    # m, h0 of Hibler (1979)
    wind_drift_factor: float = 0.02        # free drift: u_i = u_o + 0.02 u_a
    min_concentration: float = 1e-3
    min_thickness: float = 0.05     # m, floor for h in 1/h terms
    newton_iterations: int = 3      # skin-temperature balance solves
    rho_air: float = 1.2
    cp_air: float = 1004.0
    stefan_boltzmann: float = 5.67e-8
    rho_ocean: float = 1020.0       # must match CoupledConfig.rho_ocean
    cp_ocean: float = 3991.0
    ice_ocean_drag: float = 5.5e-3  # momentum exchange coefficient

    def limit(self, T, S):
        """Freezing-point clamp (the implicit-tier behavior is kept: the
        prognostic model still prevents supercooled seawater; the heat
        removed appears as frazil ice in ``seaice_thermodynamics``)."""
        return jnp.maximum(T, self.liquidus.freezing_temperature(S))


def _skin_temperature(si: SlabSeaIce, h_eff, T_f, atmos):
    """Ice skin temperature (degC) from the zero-layer surface balance.

    Solves Q_atm(Ts) + Q_c(Ts) = 0 with Newton iterations, where
    Q_c = k (T_f - Ts)/h conducts ocean-side heat to the surface and
    Q_atm = SW + LW(Ts) + sensible(Ts) is the atmospheric input; both are
    positive INTO the surface.  Melting surfaces clamp at 0 degC (the
    residual imbalance melts ice in ``seaice_thermodynamics``)."""
    sig, eps_lw = si.stefan_boltzmann, si.emissivity
    U = jnp.sqrt(atmos["ua"] ** 2 + atmos["va"] ** 2) + 0.1
    cs = si.rho_air * si.cp_air * si.transfer_coefficient * U
    sw = (1.0 - si.albedo) * atmos["Qsw"]
    k_h = si.conductivity / h_eff

    Ts = jnp.minimum(T_f, 0.0)
    for _ in range(si.newton_iterations):  # tiny fixed unroll, fuses fully
        Ts_K = Ts + 273.15
        F = (sw + eps_lw * (atmos["Qlw"] - sig * Ts_K**4)
             + cs * (atmos["Ta"] - Ts_K) + k_h * (T_f - Ts))
        dF = -4.0 * eps_lw * sig * Ts_K**3 - cs - k_h
        Ts = Ts - F / dF
    return jnp.minimum(Ts, 0.0)


def seaice_thermodynamics(si: SlabSeaIce, grid, atmos, ocean_state, ice, dt):
    """Zero-layer growth/melt + frazil. Returns (ice', ocean-coupling dict).

    The coupling dict carries kinematic flux *adjustments* for the ocean
    surface (positive into the ocean): ``T_flux`` (basal heat extraction +
    frazil heat release), ``S_flux`` (brine rejection / meltwater), and
    ``shade`` = a (the open-water flux fraction is 1 - a)."""
    rhoL = si.rho_ice * si.latent_fusion
    SST = ocean_state.tracers["T"][:, :, -1]
    S_surf = ocean_state.tracers["S"][:, :, -1]
    T_f = si.liquidus.freezing_temperature(S_surf)
    hz, Nz = grid.hz, grid.Nz
    dz_top = grid.dz_c[:, :, hz + Nz - 1]  # (1, 1) or (X, Y) metric slice
    rho_w_cw = si.rho_ocean * si.cp_ocean

    a, v = ice.a, ice.v
    h_eff = jnp.maximum(v / jnp.maximum(a, si.min_concentration), si.min_thickness)

    # --- surface balance over the ice fraction ---
    Ts = _skin_temperature(si, h_eff, T_f, atmos)
    Q_c = si.conductivity * (T_f - Ts) / h_eff  # >0: freezing (heat drawn up)
    sig, eps_lw = si.stefan_boltzmann, si.emissivity
    U = jnp.sqrt(atmos["ua"] ** 2 + atmos["va"] ** 2) + 0.1
    cs = si.rho_air * si.cp_air * si.transfer_coefficient * U
    Ts_K = Ts + 273.15
    Q_atm = ((1.0 - si.albedo) * atmos["Qsw"]
             + eps_lw * (atmos["Qlw"] - sig * Ts_K**4)
             + cs * (atmos["Ta"] - Ts_K))
    # clamped (melting) surfaces leave a positive residual -> surface melt
    dh_surf = -jnp.maximum(Q_atm + Q_c, 0.0) * dt / rhoL

    # --- basal growth/melt against the ocean-ice heat flux ---
    Q_oi = rho_w_cw * si.basal_exchange_velocity * (SST - T_f)  # >0 melts
    dh_base = (Q_c - Q_oi) * dt / rhoL

    # --- frazil: supercooled top cell freezes back to T_f ---
    deficit = jnp.maximum(T_f - SST, 0.0) * rho_w_cw * dz_top  # J/m^2
    dv_frazil = deficit / rhoL

    dh = dh_surf + dh_base
    v_new = jnp.maximum(v + a * dh + dv_frazil, 0.0)
    dv_actual = v_new - v  # net ice made this step (cell-mean, >=0 grows)

    # --- concentration: Hibler lead closing + proportional melt ---
    da_frz = (1.0 - a) * jnp.maximum(dv_frazil + a * jnp.maximum(dh, 0.0), 0.0) \
        / si.lead_closing_thickness
    da_melt = jnp.where(dh < 0, a * dh / (2.0 * h_eff), 0.0)
    a_new = jnp.clip(a + da_frz + da_melt, 0.0, 1.0)
    a_new = jnp.where(v_new <= 0.0, 0.0, jnp.maximum(a_new, si.min_concentration))

    # --- ocean coupling (kinematic, positive into the ocean) ---
    # basal exchange cools/warms the top cell under the ice fraction; frazil
    # formation releases exactly the latent heat that restores SST to T_f
    T_flux = -a * Q_oi / rho_w_cw + deficit / (rho_w_cw * dt)
    # virtual salt flux: growing ice rejects brine (S_surf - S_ice), melt
    # dilutes; scaled by the water-equivalent volume rate
    S_flux = (S_surf - si.ice_salinity) * (si.rho_ice / si.rho_ocean) \
        * dv_actual / dt

    ice_new = SeaIceState(v=v_new, a=a_new)
    coupling = {"T_flux": T_flux, "S_flux": S_flux, "shade": a,
                "Ts": Ts, "Q_conductive": Q_c, "Q_basal": Q_oi}
    return ice_new, coupling


def seaice_advect(si: SlabSeaIce, grid, ocean_state, ice, atmos, dt, comm=None):
    """Free-drift advection of (v, a): first-order upwind on the C-grid.

    One width-1 halo exchange per field per step (2-D, like a single
    barotropic substep); conservative flux form in the cell areas."""
    from gb25_tpu.models.free_surface import _crop2, _extend2, _metrics2
    from gb25_tpu.ops.stencils import sm

    dxc2, dxf2, dyc2, dyf2, azc2 = _metrics2(grid, h=1)
    u_srf = ocean_state.u[:, :, -1]
    v_srf = ocean_state.v[:, :, -1]
    # free drift at the velocity points (atmos winds live on centers; a
    # one-sided shift is within the scheme's first-order accuracy)
    ue = _extend2(grid, u_srf + si.wind_drift_factor * atmos["ua"], "u", comm)
    ve = _extend2(grid, v_srf + si.wind_drift_factor * atmos["va"], "v", comm)

    def upwind_div(q):
        # metrics from _metrics2 are 2-D: (X+2, Y+2), or (1, Y+2) broadcast
        # rows on lat-lon grids
        qe = _extend2(grid, q, "c", comm)
        qx = jnp.where(ue > 0, sm(qe, "x"), qe)       # value at u-faces
        qy = jnp.where(ve > 0, sm(qe, "y"), qe)       # value at v-faces
        Fx = ue * qx * dyc2
        Fy = ve * qy * dxf2
        div = ((jnp.roll(Fx, -1, 0) - Fx) + (jnp.roll(Fy, -1, 1) - Fy)) / azc2
        return _crop2(grid, div)

    v_new = jnp.maximum(ice.v - dt * upwind_div(ice.v), 0.0)
    a_new = jnp.clip(ice.a - dt * upwind_div(ice.a), 0.0, 1.0)
    a_new = jnp.where(v_new <= 0.0, 0.0, a_new)
    if getattr(grid, "immersed", False):
        # no ice on land columns (bottom_height is clamped to [z_bot, 0]:
        # land columns sit exactly at 0)
        wet = (grid.bottom_height < 0.0).astype(v_new.dtype)
        v_new, a_new = v_new * wet, a_new * wet
    return SeaIceState(v=v_new, a=a_new)
