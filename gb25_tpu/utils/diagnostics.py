"""Diagnostic fields computed from model state (for output writers, progress
callbacks, and analysis — reference analog: the progress callback's max|u| /
extrema(T) reporting and the visualization script's derived fields)."""

from __future__ import annotations

import jax.numpy as jnp

from gb25_tpu.ops.halos import extend_field
from gb25_tpu.ops.operators import diagnose_w, vertical_vorticity


def surface_vorticity(grid, state, comm=None):
    """Relative vorticity zeta at corners, surface layer (Nx, Ny)."""
    ue = extend_field(grid, state.u, "u", comm)
    ve = extend_field(grid, state.v, "v", comm)
    z = vertical_vorticity(grid, ue, ve)
    return grid.interior(z)[:, :, -1]


def surface_speed(state):
    return jnp.sqrt(state.u[:, :, -1] ** 2 + state.v[:, :, -1] ** 2)


def total_kinetic_energy(grid, state):
    """Volume-integrated kinetic energy [m^5/s^2 / rho0]."""
    hy, hz = grid.hy, grid.hz
    az = grid.azc[:, hy : hy + grid.Ny, :]
    dz = grid.dz_c[:, :, hz : hz + grid.Nz]
    ke = 0.5 * (state.u**2 + state.v**2)
    return jnp.sum(ke * az * dz)


def eddy_mean_kinetic_energy(grid, state):
    """(EKE, MKE): volume-weighted mean eddy / zonal-mean kinetic energy.

    Standard zonal-mean Reynolds decomposition u = [u] + u' (brackets =
    zonal mean along x, the periodic direction of the benchmark grid):
    EKE = <(u'^2 + v'^2)/2>, MKE = <([u]^2 + [v]^2)/2>, volume-weighted by
    az*dz.  This is the eddy statistic the baroclinic-instability benchmark
    is judged on (reference analog: the eddy field the visualization script
    renders, /root/reference/simulations/baroclinic_instability_simulation.jl)
    — during the linear phase EKE grows ~exp(2 sigma t) with sigma the Eady
    rate; see scripts/probes/eddy_statistics.py.
    """
    hy, hz = grid.hy, grid.hz
    az = grid.azc[:, hy : hy + grid.Ny, :]
    dz = grid.dz_c[:, :, hz : hz + grid.Nz]
    w = az * dz  # (1, Ny, Nz) cell volume weight (x-uniform grid)
    wsum = jnp.sum(w) * grid.Nx

    um = jnp.mean(state.u, axis=0, keepdims=True)
    vm = jnp.mean(state.v, axis=0, keepdims=True)
    up = state.u - um
    vp = state.v - vm
    eke = jnp.sum(0.5 * (up**2 + vp**2) * w) / wsum
    mke = jnp.sum(0.5 * (um**2 + vm**2) * w) * grid.Nx / wsum
    return eke, mke


def vertical_velocity(grid, state, comm=None):
    """Diagnostic w at z-faces (interior array)."""
    ue = extend_field(grid, state.u, "u", comm)
    ve = extend_field(grid, state.v, "v", comm)
    return grid.interior(diagnose_w(grid, ue, ve))


def mixed_layer_depth(grid, state, delta_T=0.2):
    """Depth where T first drops delta_T below the surface value."""
    T = state.tracers["T"]
    zc = grid.z_c_i
    below = T < (T[:, :, -1:] - delta_T)
    # deepest index (from surface downward) where criterion holds
    idx = jnp.argmax(below[:, :, ::-1], axis=2)
    hit = below.any(axis=2)
    mld = jnp.where(hit, -zc[::-1][idx], -zc[0])
    return mld
