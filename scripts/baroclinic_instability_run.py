#!/usr/bin/env python
"""Serial baroclinic-instability run (reference:
simulations/baroclinic_instability_simulation_run.jl — resolution=8, Nz=10,
dt=60, compile first step + loop, execute under the profiler with phase
timing logs)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from gb25_tpu.grids import simple_latitude_longitude_grid
from gb25_tpu.models import (
    baroclinic_instability_config,
    baroclinic_instability_state,
    loop,
    time_step,
)
from gb25_tpu.utils.args import benchmark_parser, build_config, float_type, resolve_grid_size
from gb25_tpu.utils.profiling import Timer, allocator_stats, with_profiler


def main():
    from gb25_tpu.utils.env import preamble

    preamble()
    p = benchmark_parser("serial baroclinic instability run")
    p.set_defaults(resolution=8.0, Nz=10, steps=64)
    args = p.parse_args()
    dtype = float_type(args.float_type)
    Nx, Ny, Nz = resolve_grid_size(args)

    grid = simple_latitude_longitude_grid(Nx, Ny, Nz, dtype=dtype)
    cfg = build_config(args)
    state = baroclinic_instability_state(grid, tracers=cfg.tracers)

    timer = Timer()
    step = jax.jit(time_step)
    lp = jax.jit(loop, static_argnames="n")

    with timer("compile first_time_step"):
        compiled_first = step.lower(cfg, grid, state, jnp.asarray(args.dt, dtype)).compile()
    with timer("compile loop"):
        compiled_loop = lp.lower(
            cfg, grid, state, jnp.asarray(args.dt, dtype), args.steps
        ).compile()

    with with_profiler(args.profile_dir):
        with timer("first time step"):
            state = compiled_first(cfg, grid, state, jnp.asarray(args.dt, dtype))
            jax.block_until_ready(state)
        with timer("first loop"):
            state = compiled_loop(cfg, grid, state, jnp.asarray(args.dt, dtype))
            jax.block_until_ready(state)
        with timer("second loop"):
            state = compiled_loop(cfg, grid, state, jnp.asarray(args.dt, dtype))
            jax.block_until_ready(state)

    print("allocator stats:", allocator_stats())
    print(f"done: iteration={int(state.iteration)} max|u|={float(jnp.abs(state.u).max()):.4f}")


if __name__ == "__main__":
    main()
