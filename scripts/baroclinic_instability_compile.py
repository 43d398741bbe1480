#!/usr/bin/env python
"""AOT compile + IR dump (reference:
simulations/baroclinic_instability_simulation_compile.jl — emits MLIR at
unoptimized/optimized stages plus the XLA executable text for inspection;
the CI greps these artifacts). Writes:

  unopt_<name>_{first,loop}.stablehlo.mlir   (jax lowering)
  opt_<name>_{first,loop}.hlo.txt            (compiled/optimized HLO)
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from gb25_tpu.grids import simple_latitude_longitude_grid
from gb25_tpu.models import baroclinic_instability_state, loop, time_step
from gb25_tpu.utils.args import benchmark_parser, build_config, float_type, resolve_grid_size


def main():
    from gb25_tpu.utils.env import preamble

    preamble()
    p = benchmark_parser("AOT compile + IR dump")
    p.set_defaults(resolution=8.0, Nz=10, steps=16)
    p.add_argument("--out-dir", default="compile_artifacts")
    args = p.parse_args()
    dtype = float_type(args.float_type)
    Nx, Ny, Nz = resolve_grid_size(args)
    os.makedirs(args.out_dir, exist_ok=True)

    grid = simple_latitude_longitude_grid(Nx, Ny, Nz, dtype=dtype)
    cfg = build_config(args)
    state = baroclinic_instability_state(grid, tracers=cfg.tracers)
    dt = jnp.asarray(args.dt, dtype)

    name = "baroclinic_instability"
    for label, fn, fargs in (
        ("first", jax.jit(time_step), (cfg, grid, state, dt)),
        ("loop", jax.jit(loop, static_argnames="n"), (cfg, grid, state, dt, args.steps)),
    ):
        lowered = fn.lower(*fargs)
        with open(os.path.join(args.out_dir, f"unopt_{name}_{label}.stablehlo.mlir"), "w") as f:
            f.write(lowered.as_text())
        compiled = lowered.compile()
        with open(os.path.join(args.out_dir, f"opt_{name}_{label}.hlo.txt"), "w") as f:
            f.write(compiled.as_text())
        print(f"{label}: flops={compiled.cost_analysis().get('flops', -1):.3e} "
              f"memory={compiled.memory_analysis()}")

    print(f"artifacts in {args.out_dir}/")


if __name__ == "__main__":
    main()
