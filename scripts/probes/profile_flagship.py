"""Scratch: op-level profile of the flagship step (1536x768x64 f32).

ONE loop length (n=16) so the axon remote-compile service is hit once.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gb25_tpu.models.baroclinic import baroclinic_instability_model
from gb25_tpu.models.hydrostatic import loop
from gb25_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

cfg, grid, state = baroclinic_instability_model(Nx=1536, Ny=768, Nz=64, dtype=jnp.float32)
dt = 60.0
N = 16

lp = jax.jit(lambda s: loop(cfg, grid, s, dt, N))
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

with jax.profiler.trace("/tmp/flagship_profile"):
    state = lp(state)
    np.asarray(jax.device_get(state.iteration))

from gb25_tpu.analysis.xplane import summarize

for name, ms in summarize("/tmp/flagship_profile", top=40):
    print(f"{ms / N:9.3f} ms/step  {name[:110]}", flush=True)
