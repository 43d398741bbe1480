"""Stage-level timing probe for the climate configuration (tripolar +
gaussian islands + CATKE): times the CATKE diffusivity pipeline piecewise
(extends, TEOS-10 buoyancy, diffusivity math) on the real chip.

Reference analog: the @gbprofile stage timers of
/root/reference/src/model_utils.jl:99-110.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 3)[0])

import jax
import jax.numpy as jnp
import numpy as np

from gb25_tpu.models.coupled import data_free_ocean_climate_model
from gb25_tpu.models.hydrostatic import buoyancy_field
from gb25_tpu.models.catke import catke_diffusivities
from gb25_tpu.ops.halos import extend_field
from gb25_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

_res = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
_nz = int(sys.argv[2]) if len(sys.argv) > 2 else 64
ccfg, grid, atmos, state = data_free_ocean_climate_model(
    resolution=_res, Nz=_nz, dtype=jnp.float32,
    grid_type="gaussian_islands_tripolar",
)
ocfg = ccfg.ocean
print(f"grid {grid.Nx}x{grid.Ny}x{grid.Nz}", flush=True)


def timeit(name, fn, *args, n=20):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    r = f(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    tc = time.perf_counter() - t0
    for _ in range(2):
        r = f(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    el = (time.perf_counter() - t0) / n
    print(f"{name:44s} {1e3 * el:8.2f} ms  (compile+first {tc:.1f}s)", flush=True)
    return r


# pieces of the CATKE diffusivity stage
def extends(s):
    ue = extend_field(grid, s.u, "u", None)
    ve = extend_field(grid, s.v, "v", None)
    tre = {k: extend_field(grid, c, "c", None) for k, c in s.tracers.items()}
    return ue, ve, tre


timeit("extends (u,v,5 tracers)", extends, state)


def buoy(s):
    _, _, tre = extends(s)
    return buoyancy_field(ocfg, grid, tre)


timeit("extends + buoyancy (TEOS-10)", buoy, state)


def diffus(s):
    ue, ve, tre = extends(s)
    be = buoyancy_field(ocfg, grid, tre)
    return catke_diffusivities(ocfg.closure, grid, ue, ve, be, tre["e"])


timeit("extends + buoyancy + catke_diffusivities", diffus, state)

# diffusivity math alone, pre-extended inputs
ue, ve, tre = jax.jit(extends)(state)
be = jax.jit(lambda t: buoyancy_field(ocfg, grid, t))(tre)
jax.block_until_ready((ue, ve, be))
timeit("catke_diffusivities alone", lambda u, v, b, e: catke_diffusivities(
    ocfg.closure, grid, u, v, b, e), ue, ve, be, tre["e"])
timeit("buoyancy alone", lambda t: buoyancy_field(ocfg, grid, t), tre)

# ---- whole-step stages ----
from gb25_tpu.models.coupled import compute_interface_fluxes, coupled_time_step
from gb25_tpu.models.hydrostatic import time_step


def atmos_lerp(s):
    return atmos.at_time(s.time)


timeit("atmosphere at_time (pre-regrid lerp)", atmos_lerp, state)


def fluxes_fn(s):
    return compute_interface_fluxes(ccfg, grid, atmos, s, None)[0]


fl = timeit("interface fluxes (similarity + radiation)", fluxes_fn, state)


def ocean_step(s, f):
    return time_step(ocfg, grid, s, 30.0, None, surface_fluxes=f)


timeit("ocean time_step (with fluxes)", ocean_step, state, fl)


def coupled(s):
    return coupled_time_step(ccfg, grid, atmos, s, 30.0, None)


timeit("coupled_time_step (full)", coupled, state)

# baroclinic-equivalent step on the same grid minus closure/coupling: the
# closure/coupling premium is coupled - this
import dataclasses

ocfg_nc = dataclasses.replace(ocfg, closure=None)
state_nc = dataclasses.replace(
    state, tracers={k: v for k, v in state.tracers.items() if k != "e"},
    Gtracers={k: v for k, v in state.Gtracers.items() if k != "e"},
)
timeit("plain hydrostatic step (no closure, same grid)",
       lambda s: time_step(ocfg_nc, grid, s, 30.0, None), state_nc)

# ---- optional XSpace trace of the coupled step (run with PROFILE=1):
# writes a trace and prints the top ops by self time, so transpose/copy
# overhead is directly visible (analysis/xplane.py decoder)
import os

if int(os.environ.get("PROFILE", "0")):
    from gb25_tpu.utils.profiling import with_profiler
    from gb25_tpu.analysis import summarize

    pdir = os.environ.get("PROFILE_DIR", "/tmp/climate_profile")
    cj = jax.jit(coupled)
    cj(state)  # compiled above; ensure warm

    with with_profiler(pdir):
        s = state
        for _ in range(8):
            s = cj(s)
        np.asarray(jax.device_get(s.iteration))
    print(summarize(pdir, top=25), flush=True)
