"""Benchmark: baroclinic-instability time step throughput on one device.

Reference benchmark unit (BASELINE.md): one compiled loop of 256 time steps
of the sharded baroclinic-instability model; per-GPU tile 768x768x64 on Alps
GH200 at ~221 ms/step -> 1.708e8 cell-steps/s per GPU. We report
cell-steps/s/device on the same physics configuration
(SplitExplicitFreeSurface(substeps=30), WENO-5 momentum+tracers, TEOS10),
with vs_baseline = ours / reference-per-GPU.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

REFERENCE_CELL_STEPS_PER_SEC = 768 * 768 * 64 / 0.221  # Alps GH200 per-GPU


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=1536)
    p.add_argument("--ny", type=int, default=768)
    p.add_argument("--nz", type=int, default=64)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--warmup", type=int, default=4)
    p.add_argument("--dt", type=float, default=60.0)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--compute-dtype", default=None,
                   help="precision-lowered tendency computation, e.g. bfloat16 "
                        "(MultiFloat analog; ~1.5x faster, f32 state)")
    args = p.parse_args()

    from gb25_tpu.grids import simple_latitude_longitude_grid
    from gb25_tpu.models import (
        baroclinic_instability_config,
        baroclinic_instability_state,
        loop,
    )
    from gb25_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    dtype = jnp.dtype(args.dtype)
    grid = simple_latitude_longitude_grid(args.nx, args.ny, args.nz, dtype=dtype)
    cfg = baroclinic_instability_config()
    if args.compute_dtype:
        import dataclasses

        cfg = dataclasses.replace(cfg, compute_dtype=args.compute_dtype)
    state = baroclinic_instability_state(grid)

    import numpy as _np

    def _sync(s):
        # device_get forces completion (block_until_ready is unreliable on
        # some experimental platforms)
        _np.asarray(jax.device_get(s.iteration))

    lp = jax.jit(loop, static_argnames="n")
    state = lp(cfg, grid, state, args.dt, args.warmup)
    _sync(state)
    # one full throwaway loop: the first execution of a program pays one-time
    # lazy initialization; steady state is what the reference reports too
    # (its benchmark takes the *second* loop's timing)
    state = lp(cfg, grid, state, args.dt, args.steps)
    _sync(state)

    t0 = time.perf_counter()
    state = lp(cfg, grid, state, args.dt, args.steps)
    _sync(state)
    elapsed = time.perf_counter() - t0

    assert bool(jnp.isfinite(state.u).all()), "benchmark produced non-finite state"

    cells = args.nx * args.ny * args.nz
    cell_steps_per_sec = cells * args.steps / elapsed
    print(
        json.dumps(
            {
                "metric": "baroclinic_instability cell-steps/s/device "
                f"({args.nx}x{args.ny}x{args.nz}, {args.steps} steps, "
                f"{args.dtype}, ms/step={1e3 * elapsed / args.steps:.2f})",
                "value": round(cell_steps_per_sec, 1),
                "unit": "cell-steps/s",
                "vs_baseline": round(cell_steps_per_sec / REFERENCE_CELL_STEPS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
