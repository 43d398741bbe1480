"""TPU layout/bandwidth probe (round-2 investigation).

Hypothesis: with the model's (X, Y, Z) storage and Nz=64, XLA:TPU tiles the
minor-most dim onto 128 lanes, padding 64 -> 128 and wasting ~half of HBM
traffic and VPU lanes. If true, flipping the canonical layout to (Z, Y, X)
(x on lanes) should ~double array-path throughput for free.

Run on the axon TPU: PYTHONPATH=/root/repo:/root/.axon_site python probe_layout.py
Prints one JSON line per experiment.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(r):
    for leaf in jax.tree_util.tree_leaves(r):
        np.asarray(jax.device_get(leaf))


def timeit(f, *args, n=10):
    r = f(*args)
    sync(r)
    r = f(*args)  # throwaway second execution (first is ~4x slower on axon)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    sync(r)
    return (time.perf_counter() - t0) / n


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def main():
    emit("devices", devs=str(jax.devices()))

    # trivial warmup to absorb first-compile latency
    t0 = time.perf_counter()
    sync(jax.jit(lambda x: x + 1)(jnp.ones((8, 128), jnp.float32)))
    emit("warmup", first_compile_s=time.perf_counter() - t0)

    # --- 1. pure streaming copy: peak-ish achievable bandwidth ---
    for shape in [(1536, 768, 64), (64, 768, 1536), (1536, 768, 128), (1536, 768, 121)]:
        a = jnp.ones(shape, jnp.float32)
        f = jax.jit(lambda x: x * 1.000001 + 0.5)
        dt = timeit(f, a)
        gb = a.size * 4 * 2 / 1e9
        emit("copy", shape=shape, ms=dt * 1e3, eff_gbs=gb / dt)
        del a

    # --- 2. stencil micro: roll in all three dims + arithmetic ---
    def stencil(x):
        return (
            x
            + 0.25 * (jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0))
            + 0.25 * (jnp.roll(x, 1, 1) + jnp.roll(x, -1, 1))
            + 0.1 * (jnp.roll(x, 1, 2) + jnp.roll(x, -1, 2))
        )

    for shape in [(1536, 768, 64), (64, 768, 1536), (768, 768, 128), (128, 768, 768)]:
        a = jnp.ones(shape, jnp.float32)
        f = jax.jit(stencil)
        dt = timeit(f, a)
        gb = a.size * 4 * 2 / 1e9  # ideal: one read + one write
        emit("stencil3", shape=shape, ms=dt * 1e3, eff_gbs=gb / dt)
        del a

    # --- 3. memory_analysis of a jitted stencil: does XLA report padded sizes? ---
    for shape in [(1536, 768, 64), (64, 768, 1536)]:
        a = jax.ShapeDtypeStruct(shape, jnp.float32)
        c = jax.jit(stencil).lower(a).compile()
        try:
            ma = c.memory_analysis()
            emit("memory", shape=shape,
                 arg_bytes=getattr(ma, "argument_size_in_bytes", None),
                 out_bytes=getattr(ma, "output_size_in_bytes", None),
                 temp_bytes=getattr(ma, "temp_size_in_bytes", None))
        except Exception as e:  # pragma: no cover
            emit("memory", shape=shape, error=str(e))

    # --- 4. model step per-cell throughput: nz=64 vs nz=128 (same cells) ---
    from gb25_tpu.grids import simple_latitude_longitude_grid
    from gb25_tpu.models import (
        baroclinic_instability_config,
        baroclinic_instability_state,
        loop,
    )

    cfg = baroclinic_instability_config()
    for (nx, ny, nz) in [(768, 384, 64), (768, 384, 128), (384, 384, 128), (768, 384, 121)]:
        grid = simple_latitude_longitude_grid(nx, ny, nz, dtype=jnp.float32)
        state = baroclinic_instability_state(grid)
        lp = jax.jit(loop, static_argnames="n")
        steps = 8
        t0 = time.perf_counter()
        s = lp(cfg, grid, state, 60.0, 2)
        sync(s.iteration)
        compile_s = time.perf_counter() - t0
        s = lp(cfg, grid, s, 60.0, steps)
        sync(s.iteration)
        t0 = time.perf_counter()
        s = lp(cfg, grid, s, 60.0, steps)
        sync(s.iteration)
        dt = (time.perf_counter() - t0) / steps
        emit("model", shape=(nx, ny, nz), ms_per_step=dt * 1e3,
             cellsteps_per_s=nx * ny * nz / dt, compile_s=compile_s)
        del grid, state, s

    emit("done")


if __name__ == "__main__":
    main()
