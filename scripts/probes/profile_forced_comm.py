"""Scratch: op-level profile of the FORCED-COMM (decomposed-path) flagship
step on one chip (1536x768x64 f32, GB25_FORCE_COMM semantics) — itemizes the
gap between the serial 37 ms/step and the decomposed-path cost so it can be
attacked stage by stage (VERDICT r3 missing #1)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gb25_tpu.models.baroclinic import baroclinic_instability_model
from gb25_tpu.parallel import make_mesh, shard_state
from gb25_tpu.parallel.sharded import sharded_step_fn
from gb25_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

cfg, grid, state = baroclinic_instability_model(Nx=1536, Ny=768, Nz=64,
                                                dtype=jnp.float32)
if "no-overlap" in sys.argv[1:]:
    import dataclasses

    cfg = dataclasses.replace(cfg, overlap_split=False)
mode = "local" if "local" in sys.argv[1:] else "ring"
dt = jnp.float32(60.0)
N = 16

mesh = make_mesh(1, shape=(1, 1))
fn = sharded_step_fn(cfg, grid, mesh, n_inner=N, force_comm=mode)
s = shard_state(state, mesh)

t0 = time.perf_counter()
s = fn(s, dt)
np.asarray(jax.device_get(s.iteration))
print(f"compile+{N} steps: {time.perf_counter() - t0:.1f}s", flush=True)

for _ in range(2):  # warm
    s = fn(s, dt)
np.asarray(jax.device_get(s.iteration))

t0 = time.perf_counter()
for _ in range(4):
    s = fn(s, dt)
np.asarray(jax.device_get(s.iteration))
el = time.perf_counter() - t0
print(f"{4 * N} steps: {1e3 * el / (4 * N):.2f} ms/step", flush=True)

import shutil
shutil.rmtree("/tmp/forced_comm_profile", ignore_errors=True)
with jax.profiler.trace("/tmp/forced_comm_profile"):
    s = fn(s, dt)
    np.asarray(jax.device_get(s.iteration))

from gb25_tpu.analysis.xplane import summarize

for name, ms in summarize("/tmp/forced_comm_profile", top=50):
    print(f"{ms / N:9.3f} ms/step  {name[:110]}", flush=True)
