"""Stage-level timing probe for the climate configuration (tripolar +
gaussian islands + CATKE): times the CATKE diffusivity pipeline piecewise
(extends, TEOS-10 buoyancy, diffusivity math) on the real chip.

Reference analog: the @gbprofile stage timers of
/root/reference/src/model_utils.jl:99-110.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gb25_tpu.models.coupled import data_free_ocean_climate_model
from gb25_tpu.models.hydrostatic import buoyancy_field
from gb25_tpu.models.catke import catke_diffusivities
from gb25_tpu.ops.halos import extend_field
from gb25_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

ccfg, grid, atmos, state = data_free_ocean_climate_model(
    resolution=0.5, Nz=64, dtype=jnp.float32,
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
