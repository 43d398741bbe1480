#!/usr/bin/env python
"""Sharded baroclinic-instability benchmark run (reference:
sharding/sharded_baroclinic_instability_simulation_run.jl — distributed init,
2-D partition from factors(N), compile first step + a 256-step on-device
loop, execute three profiled phases logging '[rank] <label>: X seconds'
(the exact format the reference's weak-scaling scrapers parse), allocator
stats at each phase, per-rank sharded state dumps)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from gb25_tpu.grids import simple_latitude_longitude_grid
from gb25_tpu.models import baroclinic_instability_state
from gb25_tpu.parallel import factors, make_mesh, shard_state, sharded_step_fn
from gb25_tpu.utils.args import benchmark_parser, build_config, float_type
from gb25_tpu.utils.profiling import Timer, allocator_stats, with_profiler


def main():
    from gb25_tpu.utils.env import preamble

    preamble()
    p = benchmark_parser("sharded baroclinic instability benchmark")
    p.add_argument("--tile-x", type=int, default=512, help="per-device tile in x")
    p.add_argument("--tile-y", type=int, default=512)
    p.add_argument("--n-devices", type=int, default=None)
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() (multi-host pods)")
    p.add_argument("--save-dir", default=None, help="per-rank sharded state dumps")
    p.set_defaults(steps=256, dt=1.0, Nz=64)
    args = p.parse_args()

    if args.distributed:
        jax.distributed.initialize()

    n = args.n_devices or len(jax.devices())
    rx, ry = factors(n)
    Nx, Ny, Nz = args.tile_x * rx, args.tile_y * ry, args.Nz
    dtype = float_type(args.float_type)
    rank = jax.process_index()
    timer = Timer(rank)
    print(f"[{rank}] mesh {rx}x{ry}, global grid {Nx}x{Ny}x{Nz}, {args.steps}-step loop")

    grid = simple_latitude_longitude_grid(Nx, Ny, Nz, dtype=dtype)
    cfg = build_config(args)
    state = baroclinic_instability_state(grid, tracers=cfg.tracers)

    mesh = make_mesh(n, shape=(rx, ry))
    state = shard_state(state, mesh)
    dt = jnp.asarray(args.dt, dtype)

    step1 = sharded_step_fn(cfg, grid, mesh)
    stepN = sharded_step_fn(cfg, grid, mesh, n_inner=args.steps)

    with timer("compile first"):
        c_first = step1.lower(state, dt).compile()
    with timer("compile loop"):
        c_loop = stepN.lower(state, dt).compile()
    print(f"[{rank}] allocator after compile:", allocator_stats())

    with with_profiler(args.profile_dir):
        with timer("first time step"):
            state = c_first(state, dt)
            jax.block_until_ready(state)
        with timer("first loop"):
            state = c_loop(state, dt)
            jax.block_until_ready(state)
        with timer("second loop"):
            state = c_loop(state, dt)
            jax.block_until_ready(state)

    print(f"[{rank}] allocator after run:", allocator_stats())
    if args.save_dir:
        from gb25_tpu.io import save_sharded_state

        with timer("sharded state dump"):
            save_sharded_state(state, args.save_dir)

    cells = Nx * Ny * Nz
    print(f"[{rank}] done iteration={int(state.iteration)} cells={cells}")


if __name__ == "__main__":
    main()
