"""Flagship benchmark setup: the baroclinic-instability ocean model.

Reference: ``GordonBell25.baroclinic_instability_model``
(/root/reference/src/baroclinic_instability_model.jl:17-85) — a
HydrostaticFreeSurfaceModel with SplitExplicitFreeSurface(substeps=30),
TEOS10 seawater buoyancy, spherical Coriolis, WENO vector-invariant momentum
+ WENO-5 tracer advection on the simple lat-lon grid; initial conditions
T = (30 + 1e-3 z) smooth_step(phi), S = -5e-3 z (+ optional noise)
(/root/reference/src/model_utils.jl:83-110), and the random ~1e-3 velocity
seeding used by the correctness scripts
(/root/reference/correctness/correctness_baroclinic_instability_simulation_run.jl).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gb25_tpu.grids import simple_latitude_longitude_grid
from gb25_tpu.models.config import HydrostaticConfig, SplitExplicitFreeSurface
from gb25_tpu.models.state import HydrostaticState, initial_state


def smooth_step(phi):
    """(1 - tanh((|phi| - 40) / 5)) / 2 (reference model_utils.jl:83-87)."""
    return (1.0 - jnp.tanh((jnp.abs(phi) - 40.0) / 5.0)) / 2.0


def baroclinic_instability_config(
    free_surface=None,
    closure=None,
    momentum_advection="weno_vector_invariant",
    tracer_advection="weno5",
    eos=None,
) -> HydrostaticConfig:
    from gb25_tpu.ops.eos import TEOS10EquationOfState
    from gb25_tpu.models.catke import CATKEVerticalDiffusivity
    from gb25_tpu.models.keps import TKEDissipationVerticalDiffusivity

    # reference: tracers chosen from buoyancy type, +e for CATKE, +e,eps for
    # k-epsilon (baroclinic_instability_model.jl:42-57)
    tracers = ("T", "S")
    if isinstance(closure, CATKEVerticalDiffusivity):
        tracers = tracers + ("e",)
    elif isinstance(closure, TKEDissipationVerticalDiffusivity):
        tracers = tracers + ("e", "eps")

    return HydrostaticConfig(
        tracers=tracers,
        momentum_advection=momentum_advection,
        tracer_advection=tracer_advection,
        eos=eos or TEOS10EquationOfState(),
        free_surface=free_surface or SplitExplicitFreeSurface(substeps=30),
        closure=closure,
    )


def baroclinic_instability_state(
    grid, noise_velocity=1e-3, noise_tracer=0.0, seed=42, dtype=None,
    tracers=("T", "S"),
) -> HydrostaticState:
    """Initial state on the given grid (analytic T/S + optional noise)."""
    dtype = dtype or grid.dtype
    state = initial_state(grid, tracers=tracers, dtype=dtype)

    # curvilinear grids carry true 2-D latitudes; lat-lon grids a 1-D profile
    phi2 = getattr(grid, "phi2_c", None)
    if phi2 is not None:
        phi = phi2[:, :, None].astype(dtype)
    else:
        phi = grid.phi_c_i.reshape(1, -1, 1).astype(dtype)
    z = grid.z_c_i.reshape(1, 1, -1).astype(dtype)
    shape = grid.shape

    T = jnp.broadcast_to((30.0 + 1e-3 * z) * smooth_step(phi), shape)
    S = jnp.broadcast_to(-5e-3 * z + 0.0 * phi, shape)

    key = jax.random.PRNGKey(seed)
    ku, kv, kt, ks = jax.random.split(key, 4)
    u = jnp.zeros(shape, dtype)
    v = jnp.zeros(shape, dtype)
    if noise_velocity:
        u = noise_velocity * jax.random.normal(ku, shape, dtype)
        v = noise_velocity * jax.random.normal(kv, shape, dtype)
        v = v.at[:, 0, :].set(0.0)  # southern wall face
    if noise_tracer:
        T = T + noise_tracer * jax.random.uniform(kt, shape, dtype)
        S = S + noise_tracer * jax.random.uniform(ks, shape, dtype)

    new_tracers = dict(state.tracers)
    new_tracers["T"] = T.astype(dtype)
    new_tracers["S"] = S.astype(dtype)
    if "e" in new_tracers:  # seed TKE at its floor
        new_tracers["e"] = jnp.full(shape, 1e-6, dtype)
    if "eps" in new_tracers:
        new_tracers["eps"] = jnp.full(shape, 1e-9, dtype)
    return state.replace(u=u, v=v, tracers=new_tracers)


def baroclinic_instability_model(
    Nx, Ny, Nz, halo=(4, 4, 4), dtype=jnp.float32, **config_kw
):
    """Grid + config + initial state for the flagship benchmark."""
    grid = simple_latitude_longitude_grid(Nx, Ny, Nz, halo=halo, dtype=dtype)
    cfg = baroclinic_instability_config(**config_kw)
    state = baroclinic_instability_state(grid)
    return cfg, grid, state
