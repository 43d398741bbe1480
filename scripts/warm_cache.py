#!/usr/bin/env python
"""Warm the persistent XLA compilation cache for the benchmark programs
(reference: the ext/Precompile* packages compiled per-stage on tiny models;
here one AOT pass per program shape fills the on-disk cache so subsequent
launches skip the multi-minute compile)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gb25_tpu.utils.cache import enable_persistent_cache, warm
from gb25_tpu.utils.args import benchmark_parser, build_config, float_type, resolve_grid_size


def main():
    from gb25_tpu.utils.env import preamble

    preamble()
    p = benchmark_parser("warm the persistent compile cache")
    p.set_defaults(resolution=8.0, Nz=10)
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--sharded", action="store_true")
    args = p.parse_args()

    d = enable_persistent_cache(args.cache_dir)
    print(f"persistent cache: {d}")

    import jax
    from gb25_tpu.grids import simple_latitude_longitude_grid
    from gb25_tpu.models import baroclinic_instability_state

    dtype = float_type(args.float_type)
    Nx, Ny, Nz = resolve_grid_size(args)
    grid = simple_latitude_longitude_grid(Nx, Ny, Nz, dtype=dtype)
    cfg = build_config(args)
    state = baroclinic_instability_state(grid, tracers=cfg.tracers)

    mesh = None
    if args.sharded:
        from gb25_tpu.parallel import factors, make_mesh

        n = len(jax.devices())
        mesh = make_mesh(n, shape=factors(n))
    compiled = warm(cfg, grid, state, args.dt, steps=(1, args.steps), mesh=mesh)
    print("warmed:", ", ".join(compiled))


if __name__ == "__main__":
    main()
