#!/usr/bin/env python
"""AOT compile + IR dump for the coupled climate model (reference:
simulations/ocean_climate_simulation_compile.jl — the climate analog of the
baroclinic compile script; the CI inspects the emitted MLIR/HLO stages).

Writes:
  unopt_ocean_climate_{first,loop}.stablehlo.mlir   (jax lowering)
  opt_ocean_climate_{first,loop}.hlo.txt            (compiled/optimized HLO)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from gb25_tpu.models.coupled import (
    coupled_loop,
    coupled_time_step,
    data_free_ocean_climate_model,
)


def main():
    from gb25_tpu.utils.env import preamble

    preamble()
    p = argparse.ArgumentParser(description="climate AOT compile + IR dump")
    p.add_argument("--resolution", type=float, default=8.0)
    p.add_argument("--Nz", type=int, default=10)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--dt", type=float, default=60.0)
    p.add_argument("--grid", default="tripolar",
                   choices=["tripolar", "latlon"],
                   help="tripolar = the reference's benchmark grid")
    p.add_argument("--out-dir", default="compile_artifacts")
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    gt = ("gaussian_islands_tripolar" if args.grid == "tripolar"
          else "gaussian_islands")
    ccfg, grid, atmos, state = data_free_ocean_climate_model(
        resolution=args.resolution, Nz=args.Nz, dtype=jnp.float32, grid_type=gt
    )
    dt = jnp.float32(args.dt)

    name = "ocean_climate"
    for label, fn, fargs in (
        ("first", jax.jit(coupled_time_step), (ccfg, grid, atmos, state, dt)),
        ("loop", jax.jit(coupled_loop, static_argnames="n"),
         (ccfg, grid, atmos, state, dt, args.steps)),
    ):
        lowered = fn.lower(*fargs)
        with open(os.path.join(args.out_dir,
                               f"unopt_{name}_{label}.stablehlo.mlir"), "w") as f:
            f.write(lowered.as_text())
        compiled = lowered.compile()
        with open(os.path.join(args.out_dir,
                               f"opt_{name}_{label}.hlo.txt"), "w") as f:
            f.write(compiled.as_text())
        print(f"{label}: flops={compiled.cost_analysis().get('flops', -1):.3e} "
              f"memory={compiled.memory_analysis()}")

    print(f"artifacts in {args.out_dir}/")


if __name__ == "__main__":
    main()
