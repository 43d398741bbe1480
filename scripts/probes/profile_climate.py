"""Scratch: op-level profile of the climate configuration's coupled loop
(tripolar + gaussian islands + CATKE + coupled fluxes, 768x384x64 f32) —
the reference's actual benchmark model
(/root/reference/src/data_free_ocean_climate_model.jl:12-70).

ONE loop length (n=16) so the axon remote-compile service is hit once.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 3)[0])

import jax
import jax.numpy as jnp
import numpy as np

from gb25_tpu.models.coupled import coupled_loop, data_free_ocean_climate_model
from gb25_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

ccfg, grid, atmos, state = data_free_ocean_climate_model(
    resolution=0.5, Nz=64, dtype=jnp.float32,
    grid_type="gaussian_islands_tripolar",
)
dt = 30.0
N = 16

lp = jax.jit(lambda s: coupled_loop(ccfg, grid, atmos, s, dt, N))
t0 = time.perf_counter()
state = lp(state)
np.asarray(jax.device_get(state.iteration))
print(f"compile+{N} steps: {time.perf_counter() - t0:.1f}s", flush=True)

for _ in range(2):  # warm
    state = lp(state)
np.asarray(jax.device_get(state.iteration))

t0 = time.perf_counter()
for _ in range(4):
    state = lp(state)
np.asarray(jax.device_get(state.iteration))
el = time.perf_counter() - t0
print(f"{4 * N} steps: {1e3 * el / (4 * N):.2f} ms/step", flush=True)

with jax.profiler.trace("/tmp/climate_profile"):
    state = lp(state)
    np.asarray(jax.device_get(state.iteration))

from gb25_tpu.analysis.xplane import summarize

for name, ms in summarize("/tmp/climate_profile", top=40):
    print(f"{ms / N:9.3f} ms/step  {name[:110]}", flush=True)
