#!/usr/bin/env python
"""Weak-scaling sweep + analysis (reference: sharding/*_scaling_test.jl +
analysis/weak-scaling/*.jl — fixed per-device tile, growing device count,
'grid points per second per device' normalized efficiency plot/table).

On a real pod this runs once per slice size (via the pod launcher); on a dev
box it sweeps virtual CPU device counts to validate the scaling path."""

import sys, os, time, json, argparse

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_once(n, tile, Nz, steps, dtype_name):
    import jax
    import jax.numpy as jnp
    from gb25_tpu.grids import simple_latitude_longitude_grid
    from gb25_tpu.models import baroclinic_instability_state, baroclinic_instability_config
    from gb25_tpu.parallel import factors, make_mesh, shard_state, sharded_step_fn

    dtype = jnp.dtype(dtype_name)
    rx, ry = factors(n)
    Nx, Ny = tile * rx, tile * ry
    grid = simple_latitude_longitude_grid(Nx, Ny, Nz, dtype=dtype)
    cfg = baroclinic_instability_config()
    state = shard_state(baroclinic_instability_state(grid), make_mesh(n, shape=(rx, ry)))
    mesh = make_mesh(n, shape=(rx, ry))
    fn = sharded_step_fn(cfg, grid, mesh, n_inner=steps)
    dt = jnp.asarray(1.0, dtype)
    s = fn(state, dt)  # compile + warm
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s = fn(s, dt)
    jax.block_until_ready(s)
    el = time.perf_counter() - t0
    return {
        "devices": n, "mesh": [rx, ry], "global": [Nx, Ny, Nz],
        "seconds": el, "ms_per_step": 1e3 * el / steps,
        "cell_steps_per_sec_per_device": Nx * Ny * Nz * steps / el / n,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tile", type=int, default=64)
    p.add_argument("--Nz", type=int, default=8)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--counts", default="1,2,4,8")
    p.add_argument("--virtual-cpu", action="store_true",
                   help="force N virtual CPU devices (dev-box validation)")
    args = p.parse_args()
    counts = [int(c) for c in args.counts.split(",")]

    if args.virtual_cpu:
        from gb25_tpu.utils.profiling import force_virtual_cpu_devices

        force_virtual_cpu_devices(max(counts))

    results = [run_once(n, args.tile, args.Nz, args.steps, args.dtype) for n in counts]
    base = results[0]["cell_steps_per_sec_per_device"]
    print(f"{'devs':>5} {'mesh':>8} {'global':>18} {'s/loop':>8} {'ms/step':>8} {'eff':>6}")
    for r in results:
        eff = r["cell_steps_per_sec_per_device"] / base
        r["efficiency"] = eff
        print(f"{r['devices']:>5} {str(r['mesh']):>8} {str(r['global']):>18} "
              f"{r['seconds']:>8.2f} {r['ms_per_step']:>8.2f} {eff:>6.3f}")
    with open("weak_scaling_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote weak_scaling_results.json")


if __name__ == "__main__":
    main()
