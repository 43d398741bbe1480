"""Freezing-limited ocean temperature — the reference's implicit sea-ice slot.

The reference builds ``OceanSeaIceModel(ocean; atmosphere, radiation,
interfaces)`` (/root/reference/src/data_free_ocean_climate_model.jl:67,
simulations/ocean_climate_simulation.jl:89) without passing ``sea_ice``;
ClimaOcean's default for that constructor is
``FreezingLimitedOceanTemperature(LinearLiquidus(FT))``: no prognostic ice,
but wherever seawater would supercool, its temperature is clamped up to the
salinity-dependent freezing point, and the air-sea turbulent fluxes see the
limited surface temperature.  This module is the TPU-native analog.

Liquidus: the ClimaSeaIce ``LinearLiquidus`` form T_f(S) = -lambda_1 * S
(slope 0.054 degC/psu, freshwater offset 0): salty water freezes below 0 C.
"""

from __future__ import annotations

import dataclasses

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
